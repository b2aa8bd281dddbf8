"""Audio fingerprinting + near-duplicate detection over decoded PCM.

The audio twin of ``imagehash.py`` (the reference engine has no audio
operators — this is the beyond-reference LLM-data-pipeline layer): the
same clip re-encoded at a different volume, bit depth, or container
must collapse to one kept copy before it reaches a training mix.

Fingerprint (:func:`audio_fingerprint64`): the clip's samples split
into 65 frames on floor-division boundaries (``f_i = i·n // 65``, the
``cell_means`` convention), each frame reduced to its integer energy
``Σ|s|``, and bit ``i`` set iff ``E(i+1) > E(i)`` — the energy-delta
sign profile.  Strictly-positive amplitude scaling multiplies every
energy by the same factor, so the comparisons — and the fingerprint —
are EXACTLY invariant; a local edit perturbs only the bits whose frames
it touches, so edited copies land within a small Hamming distance.
Pure integer arithmetic end to end, so a SQL engine can replay the
fingerprint closed-form from a sample formula — the DuckDB oracle gates
the real WAV decoder end-to-end.

Scale shape: the only Python-per-row work is the PCM decode inside
Arrow ``mapInPandas`` batches (:func:`audio_fingerprints`) — the
shuffle carries one 64-bit fingerprint per clip, never samples; the
pair join is :func:`~architxt_spark.functions.imagehash.hamming_near_dup`
(banded, pigeonhole-exact at ``max_hamming = bands − 1``, hot-band
capped), shared verbatim with the image path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from architxt_spark.functions.imagehash import _signed64, hamming_near_dup

N_BITS = 64  #: fingerprint width; frames = N_BITS + 1

FP_SCHEMA = (
    "media_id string, n_channels int, sample_rate int, n_samples long, afp long"
)

__all__ = [
    "audio_fingerprint64",
    "audio_fingerprints",
    "frame_energies",
    "hamming_near_dup",
]


def frame_energies(samples: list[int], n_frames: int = N_BITS + 1) -> list[int]:
    """Integer frame energies ``Σ|s|`` on floor-division boundaries
    ``i·n // n_frames`` (replayable closed-form when the samples follow
    a formula)."""
    n = len(samples)
    if n < n_frames:
        raise ValueError(f"clip of {n} samples shorter than {n_frames} frames")
    bounds = [i * n // n_frames for i in range(n_frames + 1)]
    return [
        sum(abs(s) for s in samples[bounds[i]:bounds[i + 1]])
        for i in range(n_frames)
    ]


def audio_fingerprint64(samples: list[int]) -> int:
    """Energy-delta sign fingerprint: bit ``i`` iff ``E(i+1) > E(i)``
    over the 65-frame energy profile.  Signed 64-bit (bit 63 = sign)."""
    e = frame_energies(samples)
    u = 0
    for i in range(N_BITS):
        if e[i + 1] > e[i]:
            u |= 1 << i
    return _signed64(u)


def audio_fingerprints(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """(media_id, n_channels, sample_rate, n_samples, afp) per clip —
    REAL WAV decode + integer fingerprint over channel 0 inside one
    Arrow ``mapInPandas`` pass.  Undecodable rows (non-WAV / truncated /
    too short) are dropped, not failed — corpus scans meet broken
    bytes."""
    import pandas as pd

    from architxt_spark.functions.dedup import _spread
    from architxt_spark.functions.multimodal import decode_wav_samples

    def batches(it):
        for pdf in it:
            ids, chs, rates, lens, fps = [], [], [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content) if content is not None else b""
                try:
                    n_ch, rate, chans = decode_wav_samples(content)
                    fp = audio_fingerprint64(chans[0])
                except Exception:  # noqa: BLE001 — tolerant corpus scan
                    # (wave.Error / struct.error / ValueError on broken
                    # bytes: drop the row, as the image path does)
                    continue
                ids.append(str(mid))
                chs.append(n_ch)
                rates.append(rate)
                lens.append(len(chans[0]))
                fps.append(fp)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_channels": pd.Series(chs, dtype="int32"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(lens, dtype="int64"),
                    "afp": pd.Series(fps, dtype="int64"),
                }
            )

    return _spread(df.select(id_col, content_col)).mapInPandas(batches, FP_SCHEMA)
