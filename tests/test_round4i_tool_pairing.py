"""Round-4: tool-call pairing integrity (operators/sequence.py:
tool_call_pairing) — the agent-transcript rule the role automaton
can't see (it checks roles, not the tool field)."""

from schema_validata_spark.operators.sequence import tool_call_pairing


def _frame(spark):
    rows = [
        # c1: clean call/result pair, then a trailing unanswered call
        ("c1", 0, "user", None),
        ("c1", 1, "assistant", "search"),
        ("c1", 2, "tool", None),
        ("c1", 3, "assistant", "fetch"),          # unanswered (EOC)
        # c2: orphan result (prev assistant had NO tool), orphan opener
        ("c2", 0, "tool", None),                  # orphan at open
        ("c2", 1, "assistant", None),
        ("c2", 2, "tool", None),                  # orphan (no call)
        # c3: call answered across NULL-role turn -> both sides flag
        ("c3", 0, "assistant", "calc"),
        ("c3", 1, None, None),
        ("c3", 2, "tool", None),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string")


def test_hand_computed_pairing(spark):
    out = {(r.conv_id, r.turn_idx, r.issue)
           for r in tool_call_pairing(_frame(spark), "conv_id",
                                      ["turn_idx"], "role",
                                      "tool").collect()}
    assert out == {
        ("c1", 3, "unanswered_tool_call"),
        ("c2", 0, "tool_result_without_call"),
        ("c2", 2, "tool_result_without_call"),
        ("c3", 0, "unanswered_tool_call"),
        ("c3", 2, "tool_result_without_call"),
    }


def test_clean_conversation_emits_nothing(spark):
    df = spark.createDataFrame(
        [("c", 0, "user", None), ("c", 1, "assistant", "t"),
         ("c", 2, "tool", None), ("c", 3, "assistant", None)],
        "conv_id string, turn_idx int, role string, tool string")
    assert tool_call_pairing(df, "conv_id", ["turn_idx"],
                             "role", "tool").count() == 0


def test_custom_role_names(spark):
    df = spark.createDataFrame(
        [("c", 0, "bot", "api"), ("c", 1, "fn", None)],
        "conv_id string, turn_idx int, role string, tool string")
    assert tool_call_pairing(df, "conv_id", ["turn_idx"], "role",
                             "tool", assistant_role="bot",
                             tool_role="fn").count() == 0


def test_repair_cut_points_hand_computed(spark):
    from schema_validata_spark.operators.sequence import repair_cut_points
    issues = spark.createDataFrame(
        [("c1", 5, "b_issue"), ("c1", 5, "a_issue"), ("c1", 9, "z"),
         ("c2", 1, "only")],
        "conv_id string, turn_idx int, issue string")
    out = {r.conv_id: r
           for r in repair_cut_points(issues, "conv_id",
                                      "turn_idx").collect()}
    c1 = out["c1"]
    assert c1.n_issues == 3 and c1.n_issue_kinds == 3
    assert c1.cut_at == 5 and c1.first_issue == "a_issue"  # tie: name
    assert out["c2"].cut_at == 1 and out["c2"].first_issue == "only"


def test_near_dup_safe_split_keeps_clusters_together(spark):
    from schema_validata_spark.operators.dedup import near_dup_safe_split
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21)],
        "id_a long, id_b long")
    out = {r.doc_id: r.split
           for r in near_dup_safe_split(df, pairs, "doc_id").collect()}
    assert len(out) == 40
    assert out[0] == out[1] == out[2]        # one component, one split
    assert out[10] == out[11]
    assert out[20] == out[21]
    assert set(out.values()) <= {"train", "val", "test"}
