"""Round-4 continuation transcript operators: code-fence lint,
system-prompt inventory, dialogue acts, response-length trend,
loss-mask spans."""

import pandas as pd
import ray.data as rd

from aws_serverless_elt_pipeline_enterprise_ray.functions.transcripts import (
    fence_lint,
)


def _ds(rows, cols=("conv_id", "turn_idx", "role", "text")):
    return rd.from_pandas(pd.DataFrame(rows, columns=list(cols)))


# ---------------------------------------------------------------------------
# fence_lint
# ---------------------------------------------------------------------------


def test_fence_lint_truncation_shapes():
    ds = _ds(
        [
            # a: balanced code turn then clean close -> ok
            ("a", 1, "user", "write code"),
            ("a", 2, "assistant", "```py\nx=1\n```"),
            ("a", 3, "user", "thanks"),
            # b: final turn truncated mid-fence
            ("b", 1, "user", "go"),
            ("b", 2, "assistant", "```py\nx="),
            # c: mid-conversation unbalanced turn, balanced final
            ("c", 1, "assistant", "```"),
            ("c", 2, "assistant", "``` done ```  ```"),
            ("c", 3, "user", "ok"),
            # d: null text and no fences
            ("d", 1, "user", None),
            ("d", 2, "assistant", "plain"),
        ]
    )
    out = fence_lint(ds).to_pandas().set_index("conv_id").sort_index()
    a, b, c, d = out.loc["a"], out.loc["b"], out.loc["c"], out.loc["d"]
    assert a["ok"] and a["n_fenced_turns"] == 1 and a["n_unbalanced"] == 0
    assert not a["last_unbalanced"]
    assert not b["ok"] and b["n_unbalanced"] == 1 and b["last_unbalanced"]
    # c: turn1 odd(1), turn2 has 3 fences -> odd, final turn plain
    assert not c["ok"] and c["n_unbalanced"] == 2 and not c["last_unbalanced"]
    assert c["n_fenced_turns"] == 2
    assert d["ok"] and d["n_fenced_turns"] == 0 and d["n_turns"] == 2


def test_fence_lint_nonoverlapping_count_matches_sql_replace():
    # 5 backticks = ONE non-overlapping ``` (SQL replace semantics):
    # (5*1 - 2) / 3 = 1 -> odd -> unbalanced
    ds = _ds([("a", 1, "assistant", "`````")])
    out = fence_lint(ds).to_pandas()
    assert out.loc[0, "n_unbalanced"] == 1
