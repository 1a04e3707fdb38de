"""Dataset scaffold: the engine's new-table onboarding surface.

Mirror of the reference's ``make scaffold DATASET=x``
(``Makefile:384-386``, ``scripts/scaffold.sh``), which stamps four
artifacts from ``templates/``: config YAML, a per-dataset transform
handler (the UDF hook, ``templates/transform_handler.py:31-49``), DQ
rules, and sample data. Ours stamps: a TableSpec YAML (DQ rules
embedded), a transform module with the same fallback-chain field-
mapping pattern, and a seeded sample change-log file.
"""

from __future__ import annotations

import os

SPEC_TEMPLATE = """\
# TableSpec for `{name}` (scaffolded; edit freely)
name: {name}
key_cols: [conv_id, turn_idx]
order_cols: [ts, seq]
columns:
  - {{name: conv_id, type: string}}
  - {{name: turn_idx, type: int32}}
  - {{name: role, type: string}}
  - {{name: text, type: string}}
  - {{name: tool, type: string}}
  - {{name: ts, type: timestamp}}
num_partitions: 64
hot_key_salt: 8
hot_keys: []
extra_columns: keep
dq:
  not_null: [conv_id, turn_idx, ts]
  unique: [[conv_id, turn_idx]]
  ranges:
    turn_idx: [0, 100000]
  row_count_min: 1
"""

TRANSFORM_TEMPLATE = '''\
"""Per-dataset transform hook for `{name}` (M6 analogue: the
reference's scaffolded ``transform_record`` with fallback chains,
``templates/transform_handler.py:31-49``) - but vectorized: the hook
receives a whole normalized Arrow batch and must return one.

Wire it up with:

    from aws_serverless_elt_pipeline_enterprise_ray.schema import spec_from_yaml
    import dataclasses
    spec = dataclasses.replace(spec_from_yaml("specs/{name}.yaml"),
                               transform=transform_batch)
"""

import pyarrow as pa
import pyarrow.compute as pc


def transform_batch(batch: pa.Table) -> pa.Table:
    # Example fallback-chain mapping (raw.get(a) or raw.get(b) in the
    # reference becomes a vectorized coalesce):
    #   batch = batch.set_column(
    #       batch.column_names.index("tool"), "tool",
    #       pc.coalesce(batch["tool"], pa.scalar("none")))
    return batch
'''


def scaffold_dataset(name: str, out_dir: str = "specs") -> list[str]:
    if not name.replace("_", "").isalnum():
        raise ValueError(f"bad dataset name: {name!r}")
    os.makedirs(out_dir, exist_ok=True)
    created = []

    spec_path = os.path.join(out_dir, f"{name}.yaml")
    with open(spec_path, "w") as f:
        f.write(SPEC_TEMPLATE.format(name=name))
    created.append(spec_path)

    tr_path = os.path.join(out_dir, f"{name}_transform.py")
    with open(tr_path, "w") as f:
        f.write(TRANSFORM_TEMPLATE.format(name=name))
    created.append(tr_path)

    sample_dir = os.path.join(out_dir, f"{name}_sample")
    from .gen import gen_changes

    gen_changes(sample_dir, n_events=100, n_convs=5, n_files=1, seed=1)
    created.append(os.path.join(sample_dir, "changes-000000.parquet"))
    return created
