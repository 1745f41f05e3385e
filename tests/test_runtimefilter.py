"""Bloom-bitmap runtime prefilter (operators/runtimefilter.py).

Exactness contract under test: ``new_keys_via_bitmap`` is bit-equal to a
plain ``left_anti`` join for EVERY bitmap size — the bitmap only moves rows
between the "provably new, skip the join" branch and the "verify with the
real anti-join" branch; it can never drop or invent a row (a bloom filter
has false positives only, and positives are re-verified).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.operators.runtimefilter import (
    _MAYBE,
    keyset_bitmap,
    new_keys_via_bitmap,
    probe_bitmap,
    suggest_m_bits,
)


def _rows(df, cols):
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def _assert_exact(incoming, state, keys, m_bits, **kw):
    got = new_keys_via_bitmap(incoming, state, keys, m_bits, **kw)
    want = incoming.join(state.select(*keys).distinct(), on=keys, how="left_anti")
    assert _rows(got, incoming.columns) == _rows(want, incoming.columns)


class TestExactness:
    def test_overlapping_ranges_with_payload(self, spark):
        state = spark.range(0, 3000).selectExpr("id as k")
        incoming = spark.range(2000, 5000).selectExpr("id as k", "id * 7 as p")
        _assert_exact(incoming, state, ["k"], suggest_m_bits(3000))

    def test_tiny_bitmap_forces_all_candidates_still_exact(self, spark):
        # m=64 → one word, saturated: every row is a candidate; the verify
        # anti-join carries the whole delta and the result stays exact
        state = spark.range(0, 500).selectExpr("id as k")
        incoming = spark.range(300, 900).selectExpr("id as k")
        _assert_exact(incoming, state, ["k"], 64)

    def test_empty_state_returns_all_incoming(self, spark):
        state = spark.range(0).selectExpr("id as k")
        incoming = spark.range(0, 400).selectExpr("id as k")
        out = new_keys_via_bitmap(incoming, state, ["k"], 1024)
        assert out.count() == 400

    def test_empty_incoming(self, spark):
        state = spark.range(0, 100).selectExpr("id as k")
        incoming = spark.range(0).selectExpr("id as k")
        assert new_keys_via_bitmap(incoming, state, ["k"], 1024).count() == 0

    def test_composite_and_string_keys(self, spark):
        state = spark.range(0, 800).selectExpr(
            "id div 10 as a", "concat('u', pmod(id, 10)) as b"
        )
        incoming = spark.range(0, 2000).selectExpr(
            "id div 7 as a", "concat('u', pmod(id, 13)) as b", "id as p"
        )
        _assert_exact(incoming, state, ["a", "b"], suggest_m_bits(800))

    def test_duplicate_keys_both_sides(self, spark):
        # state duplicates collapse via distinct; incoming duplicates must
        # BOTH survive or BOTH drop (anti-join row semantics)
        state = spark.range(0, 100).selectExpr("pmod(id, 20) as k")
        incoming = spark.range(0, 200).selectExpr("pmod(id, 50) as k", "id as p")
        _assert_exact(incoming, state, ["k"], 4096)

    def test_null_keys_are_new_like_the_anti_join_says(self, spark):
        # SQL semantics: a NULL key never equals anything, so null-key rows
        # are "new" under left_anti — the prefiltered path must agree
        state = spark.range(0, 50).selectExpr(
            "if(id = 7, null, id) as k"
        )
        incoming = spark.range(0, 80).selectExpr(
            "if(pmod(id, 11) = 0, null, id) as k", "id as p"
        )
        _assert_exact(incoming, state, ["k"], 2048)

    def test_key_dtype_mismatch_refused_loudly(self, spark):
        # r12 review (reproduced): xxhash64 hashes by physical type —
        # bigint 5 and int 5 hash differently while the verify join would
        # coerce and match, so a silent mismatch re-admits every duplicate.
        # The operator must refuse instead.
        from embulk_executor_mapreduce_spark.errors import ConfigError

        state = spark.range(0, 100).selectExpr("id as k")  # bigint
        incoming = spark.range(50, 150).selectExpr("cast(id as int) as k")
        with pytest.raises(ConfigError, match="type"):
            new_keys_via_bitmap(incoming, state, ["k"], 4096)

    def test_shuffle_probe_variant_matches(self, spark):
        # broadcast=False: the probe joins go through whatever strategy
        # Catalyst picks — correctness is identical (giant-bitmap path)
        state = spark.range(0, 1000).selectExpr("id as k")
        incoming = spark.range(500, 1500).selectExpr("id as k")
        _assert_exact(incoming, state, ["k"], 16384, broadcast=False)


class TestFilterQuality:
    def test_no_false_negatives_by_construction(self, spark):
        # every state key must probe positive against its own bitmap
        state = spark.range(0, 5000).selectExpr("id * 31 as k")
        m = suggest_m_bits(5000)
        bm = keyset_bitmap(state, ["k"], m)
        probed = probe_bitmap(state, bm, ["k"], m)
        assert probed.filter(~F.col(_MAYBE)).count() == 0

    def test_fpp_within_design_band(self, spark):
        # k=2 hashes, m=16n → design fpp ≈ 1.5%; assert the observed rate
        # over disjoint probe keys stays an order of magnitude inside sane
        state = spark.range(0, 8000).selectExpr("id as k")
        fresh = spark.range(100_000, 108_000).selectExpr("id as k")
        m = suggest_m_bits(8000)
        bm = keyset_bitmap(state, ["k"], m)
        fp = probe_bitmap(fresh, bm, ["k"], m).filter(F.col(_MAYBE)).count()
        assert fp / 8000 < 0.10, f"false-positive rate {fp / 8000:.3f} out of band"

    def test_bitmap_is_bounded_by_words_not_keys(self, spark):
        state = spark.range(0, 10_000).selectExpr("id as k")
        m = 4096  # deliberately tiny: 64 words max
        bm = keyset_bitmap(state, ["k"], m)
        assert bm.count() <= 64

    def test_suggest_m_bits_power_of_two_floor(self):
        assert suggest_m_bits(0) == 1024
        assert suggest_m_bits(64) == 1024
        m = suggest_m_bits(1_000_000)
        assert m >= 16_000_000 and (m & (m - 1)) == 0


class TestAntiStateStage:
    """`anti_state` declarative filter stage: exact dedup of a delta
    against a landed merge state, through the bloom prefilter."""

    @pytest.fixture(scope="class")
    def state_dir(self, spark, tmp_path_factory):
        from embulk_executor_mapreduce_spark.sinks.writer import write_sink
        from embulk_executor_mapreduce_spark.spec import SinkSpec

        path = str(tmp_path_factory.mktemp("anti_state") / "state")
        landed = spark.range(0, 300).selectExpr(
            "id as k", "id * 3 as v", "0 as mo"
        )
        write_sink(
            landed,
            SinkSpec(
                type="parquet",
                path=path,
                mode="merge",
                merge_key=("k",),
                merge_order=("mo",),
            ),
        )
        return path

    def test_spec_stage_matches_plain_anti_join(self, spark, state_dir, tmp_path):
        from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline
        from embulk_executor_mapreduce_spark.spec import load_spec

        inc_path = str(tmp_path / "delta")
        spark.range(200, 600).selectExpr("id as k", "id * 7 as p").write.parquet(
            inc_path
        )
        df = compile_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": inc_path},
                    "filters": [
                        {
                            "type": "anti_state",
                            "state": {"type": "merge_state", "path": state_dir},
                            "keys": ["k"],
                        }
                    ],
                    "out": {"type": "null"},
                }
            ),
        )
        got = sorted(r.k for r in df.collect())
        assert got == list(range(300, 600))

    def test_broadcast_false_stage_option(self, spark, state_dir, tmp_path):
        # r12 review: a bitmap past the broadcast cap needs the shuffle
        # probe from YAML, not just from the library API
        from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline
        from embulk_executor_mapreduce_spark.spec import load_spec

        inc_path = str(tmp_path / "delta_b")
        spark.range(200, 600).selectExpr("id as k").write.parquet(inc_path)
        df = compile_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": inc_path},
                    "filters": [
                        {
                            "type": "anti_state",
                            "state": {"type": "merge_state", "path": state_dir},
                            "keys": ["k"],
                            "broadcast": False,
                        }
                    ],
                    "out": {"type": "null"},
                }
            ),
        )
        assert sorted(r.k for r in df.collect()) == list(range(300, 600))

    def test_prefilter_false_degrades_to_plain_anti_join(
        self, spark, state_dir, tmp_path
    ):
        from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline
        from embulk_executor_mapreduce_spark.spec import load_spec

        inc_path = str(tmp_path / "delta2")
        spark.range(250, 350).selectExpr("id as k").write.parquet(inc_path)
        df = compile_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": inc_path},
                    "filters": [
                        {
                            "type": "anti_state",
                            "state": {"type": "merge_state", "path": state_dir},
                            "keys": ["k"],
                            "prefilter": False,
                        }
                    ],
                    "out": {"type": "null"},
                }
            ),
        )
        assert sorted(r.k for r in df.collect()) == list(range(300, 350))
        assert "LeftAnti" in df._jdf.queryExecution().executedPlan().toString()

    def test_config_error_matrix(self, spark, state_dir, tmp_path):
        from embulk_executor_mapreduce_spark.errors import ConfigError
        from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline
        from embulk_executor_mapreduce_spark.spec import load_spec

        inc_path = str(tmp_path / "delta3")
        spark.range(0, 10).selectExpr("id as k").write.parquet(inc_path)

        def run(stage):
            compile_pipeline(
                spark,
                load_spec(
                    {
                        "in": {"type": "parquet", "path": inc_path},
                        "filters": [stage],
                        "out": {"type": "null"},
                    }
                ),
            )

        state = {"type": "merge_state", "path": state_dir}
        bad = [
            ({"type": "anti_state", "keys": ["k"]}, "state"),
            ({"type": "anti_state", "state": state}, "keys"),
            ({"type": "anti_state", "state": state, "keys": ["nope"]}, "missing from the data"),
            ({"type": "anti_state", "state": state, "keys": ["k", "v2"]}, "missing from the data"),
            ({"type": "anti_state", "state": state, "keys": ["k"], "num_hashes": 0}, "num_hashes"),
            ({"type": "anti_state", "state": state, "keys": ["k"], "bits_per_key": 0}, "bits_per_key"),
            ({"type": "anti_state", "state": state, "keys": ["k"], "expected_keys": 0}, "expected_keys"),
            # non-integer tuning is a config typo, not an internal ValueError
            ({"type": "anti_state", "state": state, "keys": ["k"], "num_hashes": "two"}, "integer"),
            ({"type": "anti_state", "state": state, "keys": ["k"], "expected_keys": "lots"}, "integer"),
        ]
        for stage, needle in bad:
            with pytest.raises(ConfigError, match=needle):
                run(stage)
        # a key present in the data but absent from the state
        inc2 = str(tmp_path / "delta4")
        spark.range(0, 10).selectExpr("id as k", "id as extra").write.parquet(inc2)
        with pytest.raises(ConfigError, match="missing from the state"):
            compile_pipeline(
                spark,
                load_spec(
                    {
                        "in": {"type": "parquet", "path": inc2},
                        "filters": [
                            {
                                "type": "anti_state",
                                "state": state,
                                "keys": ["extra"],
                            }
                        ],
                        "out": {"type": "null"},
                    }
                ),
            )

    def test_not_streamable(self, spark, state_dir, tmp_path):
        from embulk_executor_mapreduce_spark.errors import ConfigError
        from embulk_executor_mapreduce_spark.plans.compiler import (
            run_pipeline_streaming,
        )
        from embulk_executor_mapreduce_spark.spec import load_spec

        inc_path = str(tmp_path / "delta5")
        spark.range(0, 10).selectExpr("id as k").write.parquet(inc_path)
        with pytest.raises(ConfigError, match="not streamable"):
            run_pipeline_streaming(
                spark,
                load_spec(
                    {
                        "in": {"type": "parquet", "path": inc_path},
                        "filters": [
                            {
                                "type": "anti_state",
                                "state": {"type": "merge_state", "path": state_dir},
                                "keys": ["k"],
                            }
                        ],
                        "out": {"type": "parquet", "path": str(tmp_path / "o")},
                    }
                ),
            )


class TestPersistedStateBitmap:
    """write_state_bitmap / read_state_bitmap: the standing-state pattern —
    the filter is built once per commit (a maintenance step beside the
    merge state) and increments probe it without scanning the state."""

    def _mk_state(self, spark, path, hi=300):
        from embulk_executor_mapreduce_spark.sinks.writer import write_sink
        from embulk_executor_mapreduce_spark.spec import SinkSpec

        sink = SinkSpec(
            type="parquet",
            path=path,
            mode="merge",
            merge_key=("k",),
            merge_order=("mo",),
        )
        write_sink(
            spark.range(0, hi).selectExpr("id as k", "id * 3 as v", "0 as mo"),
            sink,
        )
        return sink

    def test_write_read_probe_matches_inline_build(self, spark, tmp_path):
        from embulk_executor_mapreduce_spark.operators.runtimefilter import (
            new_keys_with_bitmap,
            read_state_bitmap,
            write_state_bitmap,
        )
        from embulk_executor_mapreduce_spark.sinks.writer import read_merge_state

        path = str(tmp_path / "state")
        self._mk_state(spark, path)
        meta = write_state_bitmap(spark, path, ["k"])
        assert meta["version"] == 0 and meta["n_keys"] == 300
        got = read_state_bitmap(spark, path, ["k"])
        assert got is not None
        bitmap, meta2 = got
        assert meta2 == meta
        incoming = spark.range(200, 500).selectExpr("id as k")
        state = read_merge_state(spark, path)
        out = new_keys_with_bitmap(
            incoming, state, ["k"], bitmap, meta["m_bits"], meta["num_hashes"]
        )
        assert sorted(r.k for r in out.collect()) == list(range(300, 500))

    def test_stale_after_state_advances_and_rewrite_gcs(self, spark, tmp_path):
        import os

        from embulk_executor_mapreduce_spark.operators.runtimefilter import (
            read_state_bitmap,
            write_state_bitmap,
        )
        from embulk_executor_mapreduce_spark.sinks.writer import write_sink

        path = str(tmp_path / "state")
        sink = self._mk_state(spark, path)
        write_state_bitmap(spark, path, ["k"])
        # a second merge commit advances the pointer → bitmap stale
        write_sink(
            spark.range(300, 400).selectExpr("id as k", "id as v", "0 as mo"),
            sink,
        )
        assert read_state_bitmap(spark, path, ["k"]) is None
        meta = write_state_bitmap(spark, path, ["k"])
        assert meta["version"] == 1 and meta["n_keys"] == 400
        vs = sorted(os.listdir(os.path.join(path, "_bitmaps")))
        assert vs == ["v1"], f"superseded bitmap not GC'd: {vs}"

    def test_reparameterize_replaces_committed_bitmap(self, spark, tmp_path):
        # r12 review: rebuilding the SAME version with different tuning
        # must replace the bitmap on disk, not return a meta the disk
        # contradicts
        from embulk_executor_mapreduce_spark.operators.runtimefilter import (
            read_state_bitmap,
            write_state_bitmap,
        )

        path = str(tmp_path / "state")
        self._mk_state(spark, path)
        m1 = write_state_bitmap(spark, path, ["k"], bits_per_key=8)
        m2 = write_state_bitmap(spark, path, ["k"], bits_per_key=32)
        assert m2["bits_per_key"] == 32 and m2["m_bits"] >= m1["m_bits"]
        got = read_state_bitmap(spark, path, ["k"])
        assert got is not None and got[1] == m2
        # identical parameters short-circuit (deterministic build)
        assert write_state_bitmap(spark, path, ["k"], bits_per_key=32) == m2

    def test_key_mismatch_is_config_error(self, spark, tmp_path):
        from embulk_executor_mapreduce_spark.errors import ConfigError
        from embulk_executor_mapreduce_spark.operators.runtimefilter import (
            read_state_bitmap,
            write_state_bitmap,
        )

        path = str(tmp_path / "state")
        self._mk_state(spark, path)
        write_state_bitmap(spark, path, ["k"])
        with pytest.raises(ConfigError, match="keys"):
            read_state_bitmap(spark, path, ["v"])

    def test_non_state_path_is_config_error(self, spark, tmp_path):
        from embulk_executor_mapreduce_spark.errors import ConfigError
        from embulk_executor_mapreduce_spark.operators.runtimefilter import (
            write_state_bitmap,
        )

        plain = str(tmp_path / "plain")
        spark.range(5).write.parquet(plain)
        with pytest.raises(ConfigError, match="merge state"):
            write_state_bitmap(spark, plain, ["id"])

    def test_anti_state_stage_uses_cache_without_state_scan(
        self, spark, tmp_path, monkeypatch
    ):
        from embulk_executor_mapreduce_spark import operators
        from embulk_executor_mapreduce_spark.operators import runtimefilter
        from embulk_executor_mapreduce_spark.operators.runtimefilter import (
            write_state_bitmap,
        )
        from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline
        from embulk_executor_mapreduce_spark.spec import load_spec

        path = str(tmp_path / "state")
        self._mk_state(spark, path)
        write_state_bitmap(spark, path, ["k"])
        inc = str(tmp_path / "delta")
        spark.range(250, 450).selectExpr("id as k").write.parquet(inc)

        def boom(*a, **k):
            raise AssertionError("bitmap must come from the cache, not a build")

        monkeypatch.setattr(runtimefilter, "keyset_bitmap", boom)
        df = compile_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": inc},
                    "filters": [
                        {
                            "type": "anti_state",
                            "state": {"type": "merge_state", "path": path},
                            "keys": ["k"],
                            "bitmap_cache": True,
                        }
                    ],
                    "out": {"type": "null"},
                }
            ),
        )
        assert sorted(r.k for r in df.collect()) == list(range(300, 450))

    def test_anti_state_cache_falls_back_when_stale(self, spark, tmp_path):
        from embulk_executor_mapreduce_spark.operators.runtimefilter import (
            write_state_bitmap,
        )
        from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline
        from embulk_executor_mapreduce_spark.sinks.writer import write_sink
        from embulk_executor_mapreduce_spark.spec import load_spec

        path = str(tmp_path / "state")
        sink = self._mk_state(spark, path)
        write_state_bitmap(spark, path, ["k"])
        # pointer advances; keys 300..400 land AFTER the bitmap — a stale
        # probe would re-admit them, the fallback must not
        write_sink(
            spark.range(300, 400).selectExpr("id as k", "id as v", "0 as mo"),
            sink,
        )
        inc = str(tmp_path / "delta")
        spark.range(350, 500).selectExpr("id as k").write.parquet(inc)
        df = compile_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": inc},
                    "filters": [
                        {
                            "type": "anti_state",
                            "state": {"type": "merge_state", "path": path},
                            "keys": ["k"],
                            "bitmap_cache": True,
                        }
                    ],
                    "out": {"type": "null"},
                }
            ),
        )
        assert sorted(r.k for r in df.collect()) == list(range(400, 500))

    def test_anti_state_cache_config_errors(self, spark, tmp_path):
        from embulk_executor_mapreduce_spark.errors import ConfigError
        from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline
        from embulk_executor_mapreduce_spark.spec import load_spec

        path = str(tmp_path / "state")
        self._mk_state(spark, path)
        inc = str(tmp_path / "delta")
        spark.range(0, 10).selectExpr("id as k").write.parquet(inc)

        def run(stage):
            compile_pipeline(
                spark,
                load_spec(
                    {
                        "in": {"type": "parquet", "path": inc},
                        "filters": [stage],
                        "out": {"type": "null"},
                    }
                ),
            )

        with pytest.raises(ConfigError, match="time-travel"):
            run(
                {
                    "type": "anti_state",
                    "state": {
                        "type": "merge_state",
                        "path": path,
                        "options": {"version": 0},
                    },
                    "keys": ["k"],
                    "bitmap_cache": True,
                }
            )
        plain = str(tmp_path / "plainx")
        spark.range(0, 20).selectExpr("id as k").write.parquet(plain)
        with pytest.raises(ConfigError, match="merge_state state"):
            run(
                {
                    "type": "anti_state",
                    "state": {"type": "parquet", "path": plain},
                    "keys": ["k"],
                    "bitmap_cache": True,
                }
            )


class TestCatalogRowPlan:
    def test_bloom_row_plan_shape(self, spark):
        """Plan guard for catalog `bloom_prefilter_dedup`: the verify
        anti-join exists exactly once (the definite-new branch never joins
        state), every probe is a broadcast hash join, and the persisted
        bitmap is reused (InMemoryTableScan) rather than rebuilt per
        probe."""
        from embulk_executor_mapreduce_spark import catalog

        df = catalog.REGISTRY["bloom_prefilter_dedup"].fn(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("LeftAnti") == 1
        # 2 hashes × 2 branches = 4 probe joins, all broadcast (bitmap side)
        assert plan.count("BroadcastHashJoin") >= 4
        assert "InMemoryTableScan" in plan
        assert "CartesianProduct" not in plan
