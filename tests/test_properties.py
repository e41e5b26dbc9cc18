"""Hypothesis property tests (SURVEY.md §5 strategy):

- X7 reverse complement: involution, length preservation, vs Python
- X8 codon translation: Spark expr vs the Python codon table
- X4 zygosity ladder: status thresholds vs an independent Python model
- X2 indel padding: adjusted rows reconstruct the original VCF alleles
- J1 interval join: binned ≡ broadcast on random intervals

Each example generates a BATCH of rows and round-trips Spark once, so
example counts stay low while row coverage stays high.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

dna = st.text(alphabet="ACGTacgtN", min_size=0, max_size=30)
dna1 = st.text(alphabet="ACGT", min_size=1, max_size=8)


@given(seqs=st.lists(dna, min_size=1, max_size=40))
@SET
def test_revcomp_involution_and_python_parity(spark, seqs):
    from rat_strain_loader_pipeline_spark.functions.dna import (
        reverse_complement,
        reverse_complement_str,
    )

    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)], "i long, seq string")
    got = {
        r["i"]: (r["rc"], r["rc2"])
        for r in df.select(
            "i",
            reverse_complement(F.col("seq")).alias("rc"),
            reverse_complement(reverse_complement(F.col("seq"))).alias("rc2"),
        ).collect()
    }
    for i, s in enumerate(seqs):
        rc, rc2 = got[i]
        assert rc == reverse_complement_str(s)
        assert len(rc) == len(s)
        assert rc2 == s.upper()  # involution (engine normalizes case)


@given(seqs=st.lists(st.text(alphabet="ACGTN", min_size=0, max_size=18), min_size=1, max_size=40))
@SET
def test_codon_translate_python_parity(spark, seqs):
    from rat_strain_loader_pipeline_spark.functions.dna import (
        translate_codons,
        translate_dna_str,
    )

    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)], "i long, seq string")
    got = {r["i"]: r["aa"] for r in df.select("i", translate_codons(F.col("seq")).alias("aa")).collect()}
    for i, s in enumerate(seqs):
        assert got[i] == translate_dna_str(s), (s, got[i])


def _py_zygosity(counts, ref, var, gender, chrom, in_par):
    a, c, g, t = counts
    total = a + c + g + t
    by = {"A": a, "C": c, "G": g, "T": t}
    vc = by.get((var or "").upper(), 0)
    if total == 0:
        pct = None
    else:
        pct = math.floor(100.0 * vc / total + 0.5)
    hemi = chrom.upper() in ("X", "Y") and gender.upper() in ("M", "P") and not in_par
    if pct is None:
        status_pct = None
    else:
        status_pct = pct
    if hemi:
        status = (
            "hemizygous" if (status_pct or 0) >= 100
            else "probably hemizygous" if (status_pct or 0) >= 85
            else "possibly hemizygous"
        )
    else:
        status = (
            "homozygous" if (status_pct or 0) >= 100
            else "possibly homozygous" if (status_pct or 0) >= 85
            else "heterozygous"
        )
    return pct, status


@given(
    rows=st.lists(
        st.tuples(
            st.tuples(
                st.integers(0, 120), st.integers(0, 120),
                st.integers(0, 120), st.integers(0, 120),
            ),
            st.sampled_from("ACGT"),
            st.sampled_from("ACGT"),
            st.sampled_from(["M", "F", "P", "U"]),
            st.sampled_from(["1", "X", "Y", "MT"]),
            st.booleans(),
        ),
        min_size=1,
        max_size=60,
    )
)
@SET
def test_zygosity_ladder_vs_python_model(spark, rows):
    from rat_strain_loader_pipeline_spark.functions.zygosity import zygosity_snv

    df = spark.createDataFrame(
        [
            (i, ref, var, a, c, g, t, gender, chrom, par)
            for i, ((a, c, g, t), ref, var, gender, chrom, par) in enumerate(rows)
        ],
        "i long, ref string, var string, a int, c int, g int, t int, "
        "gender string, chrom string, in_par boolean",
    )
    z = zygosity_snv(
        F.col("ref"), F.col("var"), F.col("a"), F.col("c"), F.col("g"), F.col("t"),
        F.col("gender"), F.col("chrom"), F.col("in_par"),
    )
    got = {
        r["i"]: (r["p"], r["s"])
        for r in df.select(
            "i", z["zygosity_percent_read"].alias("p"), z["zygosity_status"].alias("s")
        ).collect()
    }
    for i, ((a, c, g, t), ref, var, gender, chrom, par) in enumerate(rows):
        pct, status = _py_zygosity((a, c, g, t), ref, var, gender, chrom, par)
        assert got[i] == (pct, status), (i, rows[i], got[i], (pct, status))


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 10_000), dna1, dna1),
        min_size=1,
        max_size=50,
    )
)
@SET
def test_indel_padding_round_trip(spark, rows):
    """X2: from the adjusted representation the ORIGINAL (pos, ref, alt)
    must be reconstructible — no information loss in the CF2 encoding."""
    from rat_strain_loader_pipeline_spark.functions.variant import adjust_for_indels

    df = spark.createDataFrame(
        [(i, p, r, a) for i, (p, r, a) in enumerate(rows)],
        "i long, pos long, ref string, alt string",
    )
    adj = adjust_for_indels(F.col("pos"), F.col("ref"), F.col("alt"))
    out = {
        r["i"]: (r["position"], r["ref_nuc"], r["var_nuc"], r["padding_base"])
        for r in df.select("i", *[v.alias(k) for k, v in adj.items()]).collect()
    }
    for i, (p, ref, alt) in enumerate(rows):
        position, ref_nuc, var_nuc, padding = out[i]
        if padding is None:
            assert (position, ref_nuc, var_nuc) == (p, ref, alt)
        else:
            assert position == p + 1
            orig_ref = padding + (ref_nuc or "")
            orig_alt = padding + (var_nuc or "")
            assert (orig_ref, orig_alt) == (ref, alt), (i, rows[i], out[i])


@given(
    probes=st.lists(
        st.tuples(st.sampled_from(["1", "2"]), st.integers(0, 3000), st.integers(0, 80)),
        min_size=1,
        max_size=40,
    ),
    intervals=st.lists(
        st.tuples(st.sampled_from(["1", "2"]), st.integers(0, 3000), st.integers(0, 400)),
        min_size=1,
        max_size=25,
    ),
)
@SET
def test_binned_interval_join_equals_broadcast(spark, probes, intervals):
    """J1 equivalence: the binned equi-join scale path returns exactly
    the broadcast range join's pairs, bins crossing or not."""
    from rat_strain_loader_pipeline_spark.operators.interval_join import (
        interval_join_binned,
        interval_join_broadcast,
    )

    p = spark.createDataFrame(
        [(i, c, s, s + w) for i, (c, s, w) in enumerate(probes)],
        "pid long, chromosome string, start_pos long, end_pos long",
    )
    iv = spark.createDataFrame(
        [(j, c, s, s + w) for j, (c, s, w) in enumerate(intervals)],
        "iid long, i_chr string, i_start long, i_stop long",
    )
    kw = dict(
        probe_keys=("chromosome", "start_pos", "end_pos"),
        interval_keys=("i_chr", "i_start", "i_stop"),
    )
    exact = {(r["pid"], r["iid"]) for r in interval_join_broadcast(p, iv, **kw).collect()}
    binned = {
        (r["pid"], r["iid"])
        for r in interval_join_binned(p, iv, bin_size=256, **kw).collect()
    }
    assert binned == exact


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_connected_components_vs_union_find(spark, edges):
    """L6 property: distributed hash-to-min labels equal a driver-side
    union-find on arbitrary random graphs (chains, cliques, cycles)."""
    from rat_strain_loader_pipeline_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {r["node_id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert got == want


@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=60, unique=True))
@SET
def test_deterministic_split_exhaustive_and_stable(spark, ids):
    """L16 property: every row gets exactly one split, assignment depends
    only on (salt, id), and bucket bounds hold."""
    from rat_strain_loader_pipeline_spark.operators.sampling import deterministic_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = deterministic_split(df, salt="s1").collect()
    assert len(out) == len(ids)
    for r in out:
        assert 0 <= r["bucket"] < 10_000
        assert r["split"] in ("train", "val", "test")
    # same salt → identical; different salt → same totals, usually different
    again = {r["doc_id"]: r["split"] for r in deterministic_split(df, salt="s1").collect()}
    assert again == {r["doc_id"]: r["split"] for r in out}


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-100, 100)),
        min_size=0,
        max_size=25,
    ),
    direction=st.sampled_from(["backward", "forward"]),
)
@SET
def test_asof_join_vs_python_model(spark, lefts, rights, direction):
    """asof_join (union+window) vs a brute-force Python lateral scan, in
    both directions, on random keyed integer timelines with duplicate
    timestamps — the property the LATERAL oracle checks at one dataset,
    here across many."""
    import datetime

    from rat_strain_loader_pipeline_spark.operators.asof import asof_join

    base = datetime.datetime(2024, 1, 1)
    ts = lambda m: base + datetime.timedelta(minutes=m)  # noqa: E731
    ldf = spark.createDataFrame(
        [(i, k, ts(m)) for i, (k, m) in enumerate(lefts)],
        "event_id long, user_id long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(100 + i, k, ts(m), float(v)) for i, (k, m, v) in enumerate(rights)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: (r["m_id"], r["m_value"])
        for r in asof_join(
            ldf, rdf, on=["user_id"], ts_col="ts",
            payload={"event_id": "m_id", "value": "m_value"},
            tiebreak="event_id", direction=direction,
        ).collect()
    }
    assert len(got) == len(lefts)
    for i, (k, m) in enumerate(lefts):
        if direction == "backward":
            cands = [(rm, 100 + j) for j, (rk, rm, _) in enumerate(rights)
                     if rk == k and rm <= m]
            want = max(cands) if cands else None
        else:
            # forward ties: lowest ts, then LOWEST event_id
            cands = [(rm, 100 + j) for j, (rk, rm, _) in enumerate(rights)
                     if rk == k and rm >= m]
            want = min(cands) if cands else None
        if want is None:
            assert got[i] == (None, None)
        else:
            rid = want[1]
            assert got[i] == (rid, float(rights[rid - 100][2]))


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 500), st.integers(1, 50)),
        min_size=1, max_size=30, unique_by=lambda t: t[0],
    ),
    n=st.integers(1, 10),
)
@SET
def test_weighted_sample_vs_python_model(spark, rows, n):
    """A-ES selection vs an independent Python mirror of the md5-uniform
    and the priority formula (micros compared with 1-ulp slack since
    ln() is evaluated by two libms)."""
    import hashlib

    from rat_strain_loader_pipeline_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: r["priority_micros"]
        for r in weighted_sample(df, "w", n=n, id_col="doc_id", salt="p").collect()
    }

    def priority(doc_id, w):
        s = f"wsample:p:{doc_id}".encode()
        v = int.from_bytes(hashlib.md5(s).digest()[8:16], "little") % (1 << 52)
        u = (float(v) + 1.0) / float(1 << 52)
        return -math.log(u) / float(w)

    model = sorted(((priority(d, w), d) for d, w in rows))[:n]
    assert set(got) == {d for _, d in model}
    for p, d in model:
        assert abs(got[d] - math.floor(p * 1e6)) <= 1


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["H", "x", "y", "zz", ""]), min_size=1, max_size=5),
        min_size=1, max_size=12,
    ),
    min_count=st.integers(2, 5),
)
@SET
def test_remove_duplicate_lines_vs_python_model(spark, docs, min_count):
    from collections import Counter

    from rat_strain_loader_pipeline_spark.operators.dedup import remove_duplicate_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_duplicate_lines(df, min_count=min_count).collect()
    }
    counts = Counter(line for _, t in rows for line in t.split("\n"))
    for i, t in rows:
        kept = [ln for ln in t.split("\n") if counts[ln] < min_count]
        removed = len(t.split("\n")) - len(kept)
        assert got[i] == ("\n".join(kept), len(kept), removed), i


@given(
    ids=st.lists(st.integers(0, 100_000), min_size=1, max_size=40, unique=True),
    n=st.integers(1, 6),
)
@SET
def test_stratified_sample_vs_python_model(spark, ids, n):
    """Salted-md5 ranking vs an independent Python mirror: selection and
    ranks are bit-exact (string hex ordering, doc_id tiebreak)."""
    import hashlib

    from rat_strain_loader_pipeline_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "s" + str(i % 2)) for i in ids], "doc_id long, lang string"
    )
    got = {
        (r["lang"], r["doc_id"]): r["sample_rank"]
        for r in stratified_sample(df, ["lang"], n, salt="h").collect()
    }
    by_stratum = {}
    for i in ids:
        by_stratum.setdefault("s" + str(i % 2), []).append(i)
    want = {}
    for lang, members in by_stratum.items():
        order = sorted(members, key=lambda d: (hashlib.md5(f"sample:h:{d}".encode()).hexdigest(), d))
        for rank, d in enumerate(order[:n], start=1):
            want[(lang, d)] = rank
    assert got == want


word = st.text(alphabet="abcdefg", min_size=1, max_size=3)


@given(
    a_pre=st.lists(word, max_size=8),
    a_post=st.lists(word, max_size=8),
    b_pre=st.lists(word, max_size=8),
    b_post=st.lists(word, max_size=8),
    shared=st.lists(word, min_size=8, max_size=12),
)
@SET
def test_winnow_guarantee_property(spark, a_pre, a_post, b_pre, b_post, shared):
    """The winnowing guarantee, adversarially: ANY two docs sharing a
    contiguous run of >= w+k-1 tokens (here 8, k=4/w=5) must share a
    fingerprint — the run contains >= w consecutive k-gram hashes, so at
    least one full window lies inside it in BOTH docs and selects the
    same minimum. Holds for both hash families."""
    from rat_strain_loader_pipeline_spark.operators.dedup import winnow_dup_pairs

    docs = spark.createDataFrame(
        [
            (0, " ".join(a_pre + shared + a_post)),
            (1, " ".join(b_pre + shared + b_post)),
        ],
        "doc_id long, text string",
    )
    for hash_fn in ("md5_oracle", "xxhash64"):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in winnow_dup_pairs(
                docs, k=4, w=5, stop_df=10**6, min_shared=1, hash_fn=hash_fn
            ).collect()
        }
        assert (0, 1) in pairs, hash_fn
