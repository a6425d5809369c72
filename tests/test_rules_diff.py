"""rules_diff: dictionary-governance diff (pure metadata — no Spark)."""

from __future__ import annotations

from schema_validata_spark.rules import Rules, rules_diff


def _r(name, d, cu=None, fk=None):
    r = Rules.from_nested_dict(name, d)
    r.composite_unique = cu or []
    r.foreign_keys = fk or []
    return r


def test_added_removed_fields():
    d = rules_diff(_r("a", {"x": {}, "gone": {}}),
                   _r("b", {"x": {}, "fresh": {}}))
    assert d["added_fields"] == ["fresh"]
    assert d["removed_fields"] == ["gone"]
    assert d["changed"] == {}


def test_direction_semantics():
    old = _r("a", {"x": {"allow_null": True, "range_min": 0.0,
                         "range_max": 10.0, "length": 20,
                         "allowed_value_list": ["a", "b", "c"],
                         "data_type": "String"}})
    new = _r("b", {"x": {"allow_null": False, "range_min": 1.0,
                         "range_max": 5.0, "length": 30,
                         "allowed_value_list": ["a", "b"],
                         "data_type": "Integer"}})
    ch = rules_diff(old, new)["changed"]["x"]
    assert ch["allow_null"]["direction"] == "tightened"
    assert ch["range_min"]["direction"] == "tightened"   # higher floor
    assert ch["range_max"]["direction"] == "tightened"   # lower ceiling
    assert ch["length"]["direction"] == "loosened"       # longer allowed
    assert ch["allowed_value_list"]["direction"] == "tightened"  # subset
    assert ch["data_type"]["direction"] == "changed"


def test_rule_appearing_tightens_disappearing_loosens():
    old = _r("a", {"x": {"range_max": 5.0}})
    new = _r("b", {"x": {"regex_pattern": "^a+$"}})
    ch = rules_diff(old, new)["changed"]["x"]
    assert ch["regex_pattern"]["direction"] == "tightened"  # None -> rule
    assert ch["range_max"]["direction"] == "loosened"       # rule -> None


def test_incomparable_list_is_changed():
    old = _r("a", {"x": {"allowed_value_list": ["a", "b"]}})
    new = _r("b", {"x": {"allowed_value_list": ["a", "c"]}})
    ch = rules_diff(old, new)["changed"]["x"]
    assert ch["allowed_value_list"]["direction"] == "changed"


def test_engine_extension_diffs_and_flags():
    old = _r("a", {"x": {"unique_value": False}},
             cu=[("k1", "k2")], fk=[("fk", "dim", "pk")])
    new = _r("b", {"x": {"unique_value": True}},
             cu=[("k1",)], fk=[("fk", "dim", "pk")])
    d = rules_diff(old, new)
    assert d["composite_unique"]["added"] == [["k1"]]
    assert d["composite_unique"]["removed"] == [["k1", "k2"]]
    assert d["foreign_keys"] == {"added": [], "removed": []}
    assert d["tightened"] == ["x:unique_value"]
    assert d["loosened"] == []
