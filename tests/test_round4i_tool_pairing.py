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
