"""Dedup-upsert tests (J4/J5): case-insensitive match, deterministic ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.upsert import (
    anti_insert,
    upsert_variants,
)


def _existing(spark):
    return spark.createDataFrame(
        [
            (1001, "1", 100, 101, "A", "C", "snv"),
            (1002, "1", 200, 200, None, "TT", "ins"),
        ],
        "rgd_id long, chromosome string, start_pos long, end_pos long, ref_nuc string, var_nuc string, variant_type string",
    )


def test_upsert_case_insensitive_match_and_new_ids(spark):
    existing = _existing(spark)
    incoming = spark.createDataFrame(
        [
            ("1", 100, 101, "a", "c", "snv"),    # case-flip match → 1001
            ("1", 200, 200, None, "tt", "ins"),  # NULL-key + case match → 1002
            ("1", 100, 101, "A", "G", "snv"),    # same pos, different allele → new
            ("1", 300, 301, "G", "T", "snv"),    # new
            ("1", 300, 301, "g", "T", "snv"),    # dup of previous within batch → same new id
        ],
        "chromosome string, start_pos long, end_pos long, ref_nuc string, var_nuc string, variant_type string",
    )
    out = upsert_variants(incoming, existing).collect()
    by_key = {(r["start_pos"], r["ref_nuc"] or "", (r["var_nuc"] or "").upper()): r for r in out}
    assert by_key[(100, "a", "C")]["rgd_id"] == 1001
    assert not by_key[(100, "a", "C")]["is_new"]
    assert by_key[(200, "", "TT")]["rgd_id"] == 1002
    new_ids = {r["rgd_id"] for r in out if r["is_new"]}
    assert new_ids == {1003, 1004}  # max existing 1002 + dense_rank
    # in-batch dup shares one id
    assert by_key[(300, "G", "T")]["rgd_id"] == by_key[(300, "g", "T")]["rgd_id"]


def test_upsert_deterministic_across_runs(spark):
    existing = _existing(spark)
    incoming = spark.createDataFrame(
        [("1", i, i + 1, "A", "T", "snv") for i in range(500, 540)],
        "chromosome string, start_pos long, end_pos long, ref_nuc string, var_nuc string, variant_type string",
    ).repartition(7)
    a = {(r["start_pos"]): r["rgd_id"] for r in upsert_variants(incoming, existing).collect()}
    b = {(r["start_pos"]): r["rgd_id"] for r in upsert_variants(incoming.repartition(3), existing).collect()}
    assert a == b  # id assignment independent of partitioning


def test_anti_insert_sample_details(spark):
    existing_details = spark.createDataFrame(
        [(1001, 7), (1002, 7)], "rgd_id long, sample_id int"
    )
    new_details = spark.createDataFrame(
        [(1001, 7, 99), (1001, 8, 88), (1003, 7, 77)],
        "rgd_id long, sample_id int, total_depth int",
    )
    out = anti_insert(new_details, existing_details, ["rgd_id", "sample_id"])
    got = sorted((r["rgd_id"], r["sample_id"]) for r in out.collect())
    assert got == [(1001, 8), (1003, 7)]


def test_distributed_ranking_matches_single_sort(spark):
    """The 100 TB two-level ranking path (per-chromosome dense_rank +
    broadcast cumulative offsets) must allocate byte-identical ids to
    the single-window path, on a batch with multiple chromosomes, NULL
    alleles, case variants, within-batch duplicates, and store matches."""
    import random

    rng = random.Random(11)
    existing_rows = [
        (2000 + i, str(c), p, p + 1, "A", "C", "snv")
        for i, (c, p) in enumerate((c, p) for c in (1, 2) for p in range(0, 50, 10))
    ]
    existing = spark.createDataFrame(
        existing_rows,
        "rgd_id long, chromosome string, start_pos long, end_pos long, "
        "ref_nuc string, var_nuc string, variant_type string",
    )
    nucs = ["A", "C", "g", "t", None]
    incoming_rows = [
        (
            rng.choice(["1", "2", "3", "X", "MT"]),
            rng.randrange(0, 60),
            rng.randrange(0, 62),
            rng.choice(nucs),
            rng.choice(nucs),
            rng.choice(["snv", "ins", "DEL"]),
        )
        for _ in range(300)
    ]
    incoming = spark.createDataFrame(
        incoming_rows,
        "chromosome string, start_pos long, end_pos long, "
        "ref_nuc string, var_nuc string, variant_type string",
    )

    def key_of(r):
        return (
            r["chromosome"].upper(),
            r["start_pos"],
            r["end_pos"],
            (r["ref_nuc"] or "\x00").upper(),
            (r["var_nuc"] or "\x00").upper(),
            r["variant_type"].upper(),
        )

    single = {key_of(r): (r["rgd_id"], r["is_new"]) for r in upsert_variants(incoming, existing).collect()}
    for stage in (False, True):
        dist = {
            key_of(r): (r["rgd_id"], r["is_new"])
            for r in upsert_variants(
                incoming, existing, distributed_ranking=True, stage_join=stage
            ).collect()
        }
        assert dist == single, f"stage_join={stage}"
