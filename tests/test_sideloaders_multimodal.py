"""Tests: 8-col VCF converter, SnpEff loader, Txt2Vcf synthesis, sample
metadata merge, VCF output sort, IUPAC, multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    media_from_rows,
    resize_metadata,
)
from rat_strain_loader_pipeline_spark.pipelines.sideloaders import (
    expand_iupac,
    load_snpeff,
    merge_sample_metadata,
    txt2vcf_genotypes,
    vcf8_to_cf2,
    vcf_output_lines,
)

VCF8 = """##fileformat=VCFv4.1
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
1\t100\trs1\tA\tT\t.\t.\tEND=101;DP=16;AC=9
1\t200\trs2\tC\tC,CT\t.\t.\tDP=20;AC=8,7
1\t300\trs3\tG\tA\t.\t.\tDP=30
"""


def test_vcf8_to_cf2_ref_depth_inference(spark, tmp_path):
    p = tmp_path / "v8.vcf"
    p.write_text(VCF8)
    rows = {(r["position"], r["var_nuc"] or ""): r for r in vcf8_to_cf2(spark, str(p)).collect()}

    # site 100: alt T depth 9; ref A inferred 16-9=7 → pseudo-allele row
    r = rows[(100, "T")]
    assert r["allele_depth"] == 9 and r["total_depth"] == 16
    assert r["count_t"] == 9 and r["count_a"] == 7  # inferred ref depth
    assert (100, "A") not in rows  # same-as-ref skipped by default

    # site 200: ref C IS among alleles → no inference; 'CT' insertion adjusts
    r = rows[(201, "T")]  # C→CT: padding stripped, pos+1
    assert r["padding_base"] == "C" and r["ref_nuc"] is None
    assert r["allele_depth"] == 7

    # site 300: no AC → counts from DP
    r = rows[(300, "A")]
    assert r["count_a"] == 30 and r["allele_depth"] == 30 and r["allele_count"] == 1


SNPEFF_VCF = """##x
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
1\t100\t.\tA\tT\t.\t.\tDP=9;ANN=T|missense_variant|MODERATE|Gene1|G1|transcript|NM_1|protein_coding|2/5|c.1A>T|p.K1*|1|1|1||,T|downstream|LOW|Gene2|G2|transcript|NM_2|protein_coding|||||||
1\t200\t.\tG\tC\t.\t.\tANN=C|intron_variant|LOW|Gene3|G3|transcript|NM_3|protein_coding|||||||
"""


def test_load_snpeff_matching(spark, tmp_path):
    p = tmp_path / "se.vcf"
    p.write_text(SNPEFF_VCF)
    store = spark.createDataFrame(
        [
            (10, 5, "1", 100, "A", "T"),   # matches site 100
            (11, 5, "1", 200, "G", "A"),   # var mismatch → no
            (12, 6, "1", 100, "A", "T"),   # other sample → filtered
        ],
        "rgd_id long, sample_id int, chromosome string, start_pos long, ref_nuc string, var_nuc string",
    )
    out = load_snpeff(spark, str(p), store, sample_id=5).collect()
    assert {r["variant_rgd_id"] for r in out} == {10}
    anns = {r["annotation"] for r in out}
    assert anns == {"missense_variant", "downstream"}
    g1 = [r for r in out if r["annotation"] == "missense_variant"][0]
    assert g1["gene_name"] == "Gene1" and g1["impact"] == "MODERATE"
    assert g1["hgvs_c"] == "c.1A>T"


def test_txt2vcf_genotype_synthesis(spark):
    df = spark.createDataFrame(
        [("N",), ("H",), ("G",), ("A",)], "g string"
    ).withColumn("alleles", F.array(F.lit("A"), F.lit("G"), F.lit("T")))
    cols = txt2vcf_genotypes(F.col("g"), F.col("alleles"))
    out = {r["g"]: (r["gt"], r["ad"]) for r in df.withColumns(cols).collect()}
    assert out["N"] == ("./.", "0,0")
    assert out["H"] == ("1/1", "0,9,0")  # homozygote → first alt (G = index 1)
    assert out["G"] == ("0/1", "9,9,0")
    assert out["A"] == ("0/0", "9,0,0")  # ref call


def test_merge_sample_metadata(spark):
    sample = spark.createDataFrame(
        [(1, "BN", "U"), (2, "SHR", "F")], "sample_id int, analysis_name string, gender string"
    )
    meta = spark.createDataFrame(
        [(1, "M", "desc1")], "sample_id int, gender string, description string"
    )
    out = {r["sample_id"]: r for r in merge_sample_metadata(sample, meta).collect()}
    assert out[1]["gender"] == "M" and out[1]["description"] == "desc1"
    assert out[2]["gender"] == "F" and out[2]["description"] is None


def test_vcf_output_lines_sorted(spark):
    df = spark.createDataFrame(
        [
            ("2", 5, "b", "A", "T", None, None, None),
            ("1", 10, "A", "G", "C", "50", "PASS", "DP=9"),
            ("1", 2, "a", "G", "C", None, None, None),
        ],
        "chrom string, pos int, id string, ref string, alt string, qual string, filter string, info string",
    )
    lines = [r["line"] for r in vcf_output_lines(df).collect()]
    assert lines[0].startswith("1\t2")
    assert lines[1].startswith("1\t10")
    assert lines[2] == "2\t5\tb\tA\tT\t.\t.\t."


def test_expand_iupac(spark):
    df = spark.createDataFrame([("R",), ("N",), ("a",)], "code string")
    out = {r["code"]: r["nucs"] for r in df.select("code", expand_iupac(F.col("code")).alias("nucs")).collect()}
    assert out["R"] == ["A", "G"]
    assert out["N"] == ["A", "C", "G", "T"]
    assert out["a"] == ["A"]


def test_multimodal_features_deterministic(spark):
    media = media_from_rows(
        spark,
        [
            (1, "image/png", b"\x89PNG fake bytes", 640, 480, None, None),
            (2, "audio/wav", b"RIFF fake", None, None, 2000, 16000),
            (3, "video/mp4", b"\x00\x00ftyp", 1920, 1080, 3500, None),
        ],
    )
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(feats[1]["feature"]) == 16
    assert feats[1]["decode_error"] is None
    # determinism: same content → same feature
    feats2 = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["feature"] == feats2[1]["feature"]

    # real-decoder path surfaces NotImplementedError per row, not task death
    errs = {r["media_id"]: r["decode_error"] for r in extract_features(media, deterministic_fake=False).collect()}
    assert all(e and "not available" in e for e in errs.values())


def test_frame_sample_and_resize_plans(spark):
    media = media_from_rows(
        spark, [(3, "video/mp4", b"x", 1920, 1080, 3500, None), (1, "image/png", b"y", 640, 480, None, None)]
    )
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in frames] == [(3, 0), (3, 1000), (3, 2000), (3, 3000)]
    rs = {r["media_id"]: (r["target_width"], r["target_height"]) for r in resize_metadata(media).collect()}
    assert rs[3] == (224, 126)
    assert rs[1] == (224, 168)


def test_audio_segment_plan(spark):
    """Overlapping windows, clamped final partial window, non-audio rows
    filtered, n_samples from sample_rate."""
    from rat_strain_loader_pipeline_spark.operators.multimodal import (
        audio_segment_plan,
        media_from_rows,
    )

    media = media_from_rows(
        spark,
        [
            (1, "audio/wav", b"x", None, None, 7000, 8000),   # 7s @ 8kHz
            (2, "video/mp4", b"y", None, None, 9000, 16000),  # filtered out
            (3, "audio/flac", b"z", None, None, 0, 16000),    # empty → no segs
        ],
    )
    segs = sorted(
        (r["media_id"], r["seg_start_ms"], r["seg_end_ms"], r["n_samples"])
        for r in audio_segment_plan(media, window_ms=5000, hop_ms=2000).collect()
    )
    assert segs == [
        (1, 0, 5000, 40000),    # full window: 5s * 8000/s
        (1, 2000, 7000, 40000),
        (1, 4000, 7000, 24000),  # clamped partial: 3s
        (1, 6000, 7000, 8000),   # clamped partial: 1s
    ]


def test_decode_media_bmp_wav_roundtrip():
    """Pure-Python round-trip: synth_bmp/synth_wav bytes parse back to
    the generating parameters, including stride-sensitive widths."""
    from rat_strain_loader_pipeline_spark.operators.multimodal import (
        decode_media,
        synth_bmp,
        synth_wav,
    )

    for w in (1, 2, 3, 4, 5, 13):  # w=1..3 have non-zero row padding
        d = decode_media(synth_bmp(w, 3, 7))
        assert (d["kind"], d["width"], d["height"], d["bits_per_sample"]) == ("bmp", w, 3, 24)
        assert d["content_sum"] == 7 * w * 3 * 3  # 0xFF padding excluded
        assert d["payload_len"] == 54 + ((w * 3 + 3) // 4) * 4 * 3

    d = decode_media(synth_wav(16000, 2, 10, -123))
    assert (d["kind"], d["n_channels"], d["sample_rate"]) == ("wav", 2, 16000)
    assert (d["bits_per_sample"], d["n_frames"]) == (16, 10)
    assert d["content_sum"] == -123 * 10 * 2
    assert d["payload_len"] == 44 + 10 * 2 * 2


def test_decode_media_topdown_bmp_and_chunk_walk():
    """Top-down BMP (negative height) and a WAV with an extra chunk
    before fmt — the decoder must walk RIFF chunks, not assume offsets."""
    import struct

    from rat_strain_loader_pipeline_spark.operators.multimodal import (
        decode_media,
        synth_bmp,
        synth_wav,
    )

    bmp = bytearray(synth_bmp(2, 2, 9))
    struct.pack_into("<i", bmp, 22, -2)  # biHeight = -2: top-down
    d = decode_media(bytes(bmp))
    assert d["height"] == 2 and d["content_sum"] == 9 * 2 * 2 * 3

    wav = synth_wav(8000, 1, 5, 100)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc"  # odd size → word-aligned
    injected = wav[:12] + extra + b"\x00" + wav[12:]
    injected = injected[:4] + struct.pack("<I", len(injected) - 8) + injected[8:]
    d = decode_media(injected)
    assert d["sample_rate"] == 8000 and d["content_sum"] == 100 * 5


def test_decode_media_rejects_unsupported():
    import struct

    import pytest

    from rat_strain_loader_pipeline_spark.operators.multimodal import decode_media, synth_bmp

    with pytest.raises(ValueError, match="magic"):
        decode_media(b"GIF89a" + b"\x00" * 40)
    with pytest.raises(ValueError, match="too short"):
        decode_media(b"BM")
    bad = bytearray(synth_bmp(2, 2, 1))
    struct.pack_into("<H", bad, 28, 8)  # 8bpp unsupported
    with pytest.raises(ValueError, match="bpp=8"):
        decode_media(bytes(bad))
    truncated = synth_bmp(4, 4, 1)[:-5]
    with pytest.raises(ValueError, match="truncated"):
        decode_media(truncated)


def test_decode_media_columns_poison_pill(spark):
    """One corrupt payload per batch lands in decode_error; good rows
    decode to exact values."""
    from rat_strain_loader_pipeline_spark.operators.multimodal import (
        decode_media_columns,
        synth_bmp,
        synth_wav,
    )

    df = spark.createDataFrame(
        [
            (1, synth_bmp(3, 2, 5)),
            (2, synth_wav(8000, 1, 4, 50)),
            (3, b"\x00\x01corrupt"),
        ],
        schema="media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in decode_media_columns(df).collect()}
    assert rows[1]["kind"] == "bmp" and rows[1]["content_sum"] == 5 * 3 * 2 * 3
    assert rows[2]["kind"] == "wav" and rows[2]["content_sum"] == 50 * 4
    assert rows[3]["kind"] is None and rows[3]["decode_error"] is not None


def test_dhash56_python_model_and_one_pixel_bound():
    """dHash bits match a direct Python model of the generator formula;
    a one-pixel edit moves at most 2 bits (the near-dup design bound)."""
    from rat_strain_loader_pipeline_spark.operators.multimodal import (
        dhash56,
        synth_bmp_textured,
    )

    w, h, s = 17, 13, 42
    base = dhash56(synth_bmp_textured(w, h, s))

    # direct model: same grid, same formula
    def gray(x, y, hot=None):
        m = (2 * s + 1) % 256
        g = (m * (7 * x * x + 5 * y * y + 3 * x * y + 11 * x + 13 * y) + s) % 256
        if hot == (x, y):
            g = (g + 9) % 256
        return g

    xs = [(i * w) // 8 for i in range(8)]
    ys = [(j * h) // 8 for j in range(8)]
    want = 0
    for j, y in enumerate(ys):
        for i in range(7):
            if gray(xs[i + 1], y) > gray(xs[i], y):
                want |= 1 << (j * 7 + i)
    assert base == want

    for hot in [(0, 0), (xs[3], ys[5]), (5, 7)]:
        bumped = dhash56(synth_bmp_textured(w, h, s, hot_x=hot[0], hot_y=hot[1]))
        assert bin(base ^ bumped).count("1") <= 2, hot


def test_media_phash_pairs_planted_recall_and_partition_invariance(spark):
    """Banded pair join finds every planted intra-group pair (guaranteed
    recall at <= max_hamming); result is partition-count invariant."""
    from rat_strain_loader_pipeline_spark.operators.multimodal import (
        media_phash_pairs,
        synth_bmp_textured,
    )

    rows = []
    for mid in range(30):
        g, v = mid // 3, mid % 3
        w, h, s = 12 + (g % 8), 10 + (g % 5), (g * 53) % 256
        hot = ((3 * v) % w, (5 * v) % h) if v > 0 else (None, None)
        rows.append((mid, synth_bmp_textured(w, h, s, hot[0], hot[1])))
    media = spark.createDataFrame(rows, "media_id long, content binary")

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_phash_pairs(media, max_hamming=4).collect()
    }
    # every intra-group pair must be present (each variant differs from
    # base by <= 2 bits, variants from each other by <= 4)
    for g in range(10):
        a, b, c = 3 * g, 3 * g + 1, 3 * g + 2
        assert (a, b) in got and (a, c) in got and (b, c) in got, g
        assert got[(b, c)] <= 4

    got7 = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_phash_pairs(media.repartition(7), max_hamming=4).collect()
    }
    assert got == got7


def test_audio_dhash55_model_and_pairs(spark):
    """Spectral hash matches a direct Python model of window energies;
    a 2-sample edit stays within the near-dup radius and the banded
    pair join finds the planted pairs."""
    import numpy as np

    from rat_strain_loader_pipeline_spark.operators.multimodal import (
        audio_dhash55,
        media_audio_pairs,
        synth_wav_samples,
    )

    def mk(n, s, v):
        m = (2 * s + 1) % 4096
        i = np.arange(n, dtype=np.int64)
        base = ((m * (7 * i * i + 11 * i) + s) % 4096) - 2048
        if v > 0:
            base[5 * v : 5 * v + 2] += 500
        return base

    n, s = 307, 1234
    base = mk(n, s, 0)
    h = audio_dhash55(synth_wav_samples(base))
    # python model: floor-bound windows, adjacent energy comparisons
    e = [int(np.abs(base[(w * n) // 56 : ((w + 1) * n) // 56]).sum()) for w in range(56)]
    want = sum((1 << w) for w in range(55) if e[w + 1] > e[w])
    assert h == want
    for v in (1, 2):
        hv = audio_dhash55(synth_wav_samples(mk(n, s, v)))
        assert bin(h ^ hv).count("1") <= 3, v

    rows = []
    for mid in range(18):
        g, v = mid // 3, mid % 3
        rows.append((mid, bytes(synth_wav_samples(mk(300 + (g % 50) * 7,
                                                     (g * 41) % 4096, v)))))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {(r["id_a"], r["id_b"]) for r in media_audio_pairs(media, max_hamming=4).collect()}
    for g in range(6):
        a, b, c = 3 * g, 3 * g + 1, 3 * g + 2
        assert {(a, b), (a, c), (b, c)} <= got, g
