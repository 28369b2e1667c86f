"""Exercise the scale knobs once at non-default values (VERDICT r1 #8):
n_buckets=256 and a hot conversation whose writes must spread over
write_salt files, then a small epoch whose merge prunes to the touched
buckets. Pins that the 10^10-row knobs (bucket count, salt) actually work
when turned, not just at the 32-bucket default.
"""

from collections import Counter

import pandas as pd

from citibike_pipeline_spark.cdc import CdcEngine
from citibike_pipeline_spark.cdc.generator import GenConfig, generate_epoch

CFG = GenConfig(
    n_convs=50,
    n_epochs=1,
    events_per_epoch=20_000,
    seed=13,
    evolution_epoch=1,
    n_hot=1,
    turns_hot=400,
    turns_normal=20,
)

N_BUCKETS = 256
WRITE_SALT = 4


def _bucket_of(spark, conv_id: str) -> int:
    return spark.sql(
        f"SELECT CAST(pmod(xxhash64('{conv_id}'), {N_BUCKETS}) AS INT)"
    ).collect()[0][0]


def test_large_bucket_count_and_hot_salting(spark, tmp_path):
    eng = CdcEngine(
        spark,
        str(tmp_path / "wh_knobs"),
        n_buckets=N_BUCKETS,
        write_salt=WRITE_SALT,
        hot_key_threshold=500,
    )
    eng.init_tables()
    pdf = generate_epoch(CFG, 0)
    eng.ingest_epoch_pandas(pdf, 0)
    metrics = eng.replay(catchup=False)

    snap = eng.silver.current_snapshot()
    assert snap.n_buckets == N_BUCKETS

    # the hot conversation (skewed generator) was detected...
    hot_conv = pdf["conv_id"].value_counts().idxmax()
    assert hot_conv in (metrics[0]["hot_convs"] or [hot_conv])
    # ...and its bucket's data spread over multiple salted write files
    files_by_bucket = Counter(f["bucket"] for f in snap.files)
    hot_bucket = _bucket_of(spark, hot_conv)
    assert files_by_bucket[hot_bucket] >= 2, (
        f"hot bucket {hot_bucket} wrote {files_by_bucket[hot_bucket]} file(s); "
        f"expected the salt to spread it over >=2"
    )

    # a small follow-up epoch merges via bucket pruning: cost bounded by the
    # touched conversations' buckets, out of 256
    touched_convs = ["conv_00003", "conv_00007", hot_conv]
    max_lsn = int(pdf["lsn"].max())
    patch = pd.DataFrame(
        {
            "lsn": [max_lsn + i + 1 for i in range(len(touched_convs))],
            "op": ["U"] * len(touched_convs),
            "conv_id": touched_convs,
            "turn_idx": [0] * len(touched_convs),
            "role": ["user"] * len(touched_convs),
            "text": [f"patched-{c}" for c in touched_convs],
            "ts": pd.to_datetime(["2024-06-01 12:00:00"] * len(touched_convs)),
            "schema_version": [1] * len(touched_convs),
            "partition_id": [0] * len(touched_convs),
            "checkpoint_epoch": [1] * len(touched_convs),
        }
    )
    eng.ingest_epoch_pandas(patch, 1)
    m = eng.apply_epoch(1)
    expected_buckets = {_bucket_of(spark, c) for c in touched_convs}
    assert m["buckets_touched"] == len(expected_buckets)
    assert m["buckets_touched"] <= 3

    got = {
        r.conv_id: r.text
        for r in eng.silver_view().filter("turn_idx = 0").collect()
        if r.conv_id in touched_convs
    }
    assert got == {c: f"patched-{c}" for c in touched_convs}
