"""Audio fingerprinting (functions/audiohash.py): invariances, locality,
the Spark decode path, and the banded pair join's plan shape."""

import pytest

from architxt_spark.functions.audiohash import (
    audio_fingerprint64,
    audio_fingerprints,
    frame_energies,
    hamming_near_dup,
)


def _clip(seed: int, n: int = 1040) -> list[int]:
    return [(((seed * 131 + f) ** 2 + 3 * (seed * 131 + f)) % 2001) - 1000 for f in range(n)]


def test_frame_energies_floor_boundaries():
    """65 frames over 130 samples = 2 samples each; energies exact."""
    samples = [1, -2] * 65
    e = frame_energies(samples)
    assert len(e) == 65
    assert all(v == 3 for v in e)
    with pytest.raises(ValueError, match="shorter"):
        frame_energies([1] * 64)


def test_fingerprint_amplitude_scale_invariant():
    """Positive integer scaling multiplies every energy by the same
    factor — the comparisons, and the fingerprint, are exactly stable."""
    base = _clip(7)
    fp = audio_fingerprint64(base)
    assert fp == audio_fingerprint64([s * 3 for s in base])
    assert fp == audio_fingerprint64([s * 17 for s in base])


def test_fingerprint_local_edit_is_local():
    """Bumping one sample touches one frame, so at most the two bits
    comparing against that frame flip."""
    base = _clip(3)
    edited = list(base)
    edited[170] += 4000  # frame 10 (boundaries i*1040//65 = 16i)
    a = audio_fingerprint64(base)
    b = audio_fingerprint64(edited)
    assert 0 < bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 2


def test_fingerprint_distinct_across_seeds():
    fps = {audio_fingerprint64(_clip(seed)) for seed in range(200)}
    assert len(fps) >= 198  # quadratic mix: essentially no collisions


def test_audio_fingerprints_spark_roundtrip(spark):
    """Spark path: REAL WAV encode → decode → fingerprint matches the
    driver-side computation; undecodable rows are dropped."""
    from architxt_spark.functions.multimodal import make_wav_bytes

    rows = []
    expect = {}
    for seed in range(4):
        vals = _clip(seed)
        rows.append((f"a{seed}", bytearray(make_wav_bytes(1, 8000, len(vals), samples=[vals]))))
        expect[f"a{seed}"] = audio_fingerprint64(vals)
    rows.append(("junk", bytearray(b"\x89PNG not a wav")))
    df = spark.createDataFrame(rows, "media_id string, content binary")
    got = {r.media_id: (r.afp, r.n_samples) for r in audio_fingerprints(df).collect()}
    assert set(got) == set(expect)
    for k, fp in expect.items():
        assert got[k] == (fp, 1040)


def test_audio_near_dup_banded_join(spark):
    """Scaled copies pair at hamming 0, locally-edited at <=2; the join
    is banded (no CartesianProduct in the plan)."""
    from architxt_spark.functions.multimodal import make_wav_bytes

    base = _clip(11)
    variants = {
        "orig": base,
        "loud": [s * 3 for s in base],
        "edit": [s + (4000 if i == 170 else 0) for i, s in enumerate(base)],
        "other": _clip(55),
    }
    df = spark.createDataFrame(
        [
            (k, bytearray(make_wav_bytes(1, 8000, len(v), samples=[v])))
            for k, v in variants.items()
        ],
        "media_id string, content binary",
    )
    fps = audio_fingerprints(df)
    pairs = hamming_near_dup(fps, "afp", bands=4, max_hamming=3)
    assert "CartesianProduct" not in pairs._jdf.queryExecution().executedPlan().toString()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[("loud", "orig")] == 0
    assert ("edit", "orig") in got and got[("edit", "orig")] <= 2
    assert not any("other" in p for p in got)
