"""Round-4: curate_transcripts — the SFT-prep composition (structural
screen → whole-conversation dedup → leakage-safe split)."""

import pytest

from schema_validata_spark.curation import curate_transcripts

TRANS = {("user", "assistant"), ("assistant", "user"),
         ("assistant", "tool"), ("tool", "assistant")}
FIRST = {"user", "system"}


def _frame(spark):
    rows = [
        # good: alternation + answered tool call
        ("good", 0, "user", "hi", None),
        ("good", 1, "assistant", "calling", "api"),
        ("good", 2, "tool", "result", None),
        ("good", 3, "assistant", "done", None),
        # dup of good under a later id (same ordered texts)
        ("zdup", 0, "user", "hi", None),
        ("zdup", 1, "assistant", "calling", "api"),
        ("zdup", 2, "tool", "result", None),
        ("zdup", 3, "assistant", "done", None),
        # automaton violation: user -> user
        ("badrole", 0, "user", "a", None),
        ("badrole", 1, "user", "b", None),
        # pairing violation: unanswered call at end
        ("badtool", 0, "user", "x", None),
        ("badtool", 1, "assistant", "y", "api"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, "
              "text string, tool string")


def test_screen_dedup_split(spark):
    out = curate_transcripts(_frame(spark), transitions=TRANS,
                             first_roles=FIRST).collect()
    convs = {r.conv_id for r in out}
    assert convs == {"good"}            # dup/bads gone, canonical kept
    assert len(out) == 4                # all its turns survive
    splits = {r.split for r in out}
    assert len(splits) == 1             # whole conversation, one split
    assert splits <= {"train", "val", "test"}


def test_md5_and_xxhash_fingerprints_agree_on_survivors(spark):
    a = {(r.conv_id, r.turn_idx)
         for r in curate_transcripts(_frame(spark), transitions=TRANS,
                                     first_roles=FIRST,
                                     hasher="md5").collect()}
    b = {(r.conv_id, r.turn_idx)
         for r in curate_transcripts(_frame(spark), transitions=TRANS,
                                     first_roles=FIRST,
                                     hasher="xxhash64").collect()}
    assert a == b


def test_plan_budget_default_on(spark):
    df = _frame(spark).orderBy("text")       # smuggle a global sort
    with pytest.raises(ValueError, match="global-sort"):
        curate_transcripts(df, transitions=TRANS, first_roles=FIRST)
    assert curate_transcripts(df, transitions=TRANS, first_roles=FIRST,
                              plan_budget=None).count() == 4
