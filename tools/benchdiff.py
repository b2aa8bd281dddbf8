"""Compare two BENCH_r*.json files per query with the noise rule from
BASELINE.md (judge on repeated minima; host load inflates single draws).

Usage::

    python tools/benchdiff.py BENCH_r05.json BENCH_r06.json [--threshold 1.3]

Prints one line per query: old, new, ratio, and a flag only when the
ratio exceeds the threshold BOTH ways of reading the draw (so one noisy
draw never flags).  Exit code 1 when any query regresses past threshold.
"""

from __future__ import annotations

import argparse
import json
import sys

#: round-7 registry folds: fold name -> the pre-r7 constituent names.
#: When one side of the diff predates the fold, the constituents present
#: are summed into a synthetic fold entry so round-over-round diffs stay
#: automatic (the sum is the honest comparison — the fold runs all of
#: its constituents in one frame).
FOLDS: dict[str, tuple[str, ...]] = {
    "window_grouping": ("window_orders", "grouping_orders"),
    "ann_suite": ("ann_topk", "ann_ivf_topk", "ann_pq_adc"),
    "dedup_pairs": (
        "dedup_minhash_lsh", "dedup_ngram_jaccard", "doc_fingerprint_winnow"
    ),
    "corpus_health": ("corpus_report", "corpus_drift"),
    "bpe_suite": ("bpe_tokenizer", "bpe_train_merges"),
    "scalar_funcs": (
        "string_funcs_parts", "date_math_orders", "json_props_events"
    ),
    "events_funnel": ("funnel_signup_view_purchase", "retention_cohorts"),
    "export_stats": ("export_sql_ddl", "export_cypher_stats"),
    "temporal_joins": ("asof_events", "range_join_signup_clicks"),
    "doc_quality_stats": ("gopher_quality_flags",),
    "sketch_suite": ("stream_fm_distinct",),
    # r11 build-line SPLITS (the reverse direction: the conflated name is
    # the OLD side; new files carry per-artifact lines).  apply_folds is
    # conditional — it only synthesizes the aggregate when the other side
    # actually has the conflated name, so two post-split files compare
    # per-artifact and a 1.5x slowdown in any single artifact flags.
    "ann_index_build": ("ivf_build", "pq_encode"),
    "model_build": ("quality_fit", "curation_fit", "dsir_fit"),
}

#: host-calibration lines (bench.py r12+): deterministic CPU / Spark
#: probes measuring the MACHINE, not the code.  Never flagged, never in
#: subtotals; when both files carry calib_spark, every query ratio is
#: also shown host-normalized (ratio / calib drift) and the regression
#: flag moves to the normalized number — the r11 x1.31 "regression" was
#: pure host drift and took a git-worktree A/B to disprove.
CALIB: tuple[str, ...] = ("calib_cpu", "calib_spark")

#: build lines whose SCOPE grew across rounds (r10: ann_index_build
#: gained the PQ encode; model_build carries the classifier + curation
#: + DSIR fits) — a higher number is scope growth, not regression
SCOPE_GROWTH: dict[str, str] = {
    "ann_index_build": "r10 scope: + PQ corpus encode",
    "model_build": "r10 scope: classifier + curation + DSIR fits",
}


def apply_folds(
    d: dict[str, float], other: dict[str, float]
) -> tuple[dict[str, float], set[str]]:
    """Sum pre-fold constituent timings into their fold name — only when
    the fold itself is absent AND the OTHER side of the diff carries the
    fold name (so two post-fold — or two post-SPLIT — files keep their
    per-entry lines and compare individually).  Second return: fold names
    synthesized from FEWER constituents than FOLDS declares (a partial
    run) — comparing those as the full fold would skew the diff, so
    callers mark them."""
    out = dict(d)
    partial: set[str] = set()
    for fold, parts in FOLDS.items():
        if fold in out or fold not in other:
            continue
        present = [p for p in parts if p in out]
        if present:
            out[fold] = round(sum(out.pop(p) for p in present), 3)
            if len(present) < len(parts):
                partial.add(fold)
    return out, partial


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    if "queries" not in d:  # bare bench.py stdout line
        raise SystemExit(f"{path}: no 'queries' key")
    return d["queries"]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--threshold", type=float, default=1.3)
    args = p.parse_args(argv)
    old_raw, new_raw = load(args.old), load(args.new)
    (old, old_partial) = apply_folds(old_raw, new_raw)
    (new, new_partial) = apply_folds(new_raw, old_raw)
    partial = old_partial | new_partial
    # host-speed drift factor: how much slower (>1) or faster (<1) the
    # NEW host is, measured by the deterministic Spark probe (the one
    # that matches the JVM-bound query lines; calib_cpu shown for
    # diagnosis).  Queries are judged on ratio/drift when available.
    drift = None
    for c in CALIB:
        if c in old and c in new and old[c]:
            r = new[c] / old[c]
            print(f"{c:32s} {old[c]:7.2f} -> {new[c]:7.2f}  x{r:4.2f}  (host probe)")
            if c == "calib_spark":
                drift = r
    if drift is not None:
        print(f"{'':32s} host-normalized column = raw ratio / x{drift:4.2f}")
    old = {q: v for q, v in old.items() if q not in CALIB}
    new = {q: v for q, v in new.items() if q not in CALIB}
    shared = sorted(set(old) & set(new))
    ratios = {q: (new[q] / old[q] if old[q] else float("inf")) for q in shared}
    judged_all = {
        q: (r / drift if drift else r) for q, r in ratios.items()
    }
    # pack-median guard (r13): the calib probe is a fixed-width codegen
    # job — a host that speeds up helps it MORE than mixed Arrow/IO
    # queries, printing a uniform phantom "norm x1.3-1.5" on every line.
    # A UNIFORM normalized shift is a probe artifact; only deviation
    # from the pack is per-query signal.  With ≥5 shared lines, a
    # REGRESSED flag additionally requires the raw ratio OR the
    # pack-relative ratio (judged / median judged) over threshold — a
    # genuinely uniform code regression still shows in raw, a masked
    # single-query regression still shows vs the pack.
    median_judged = None
    if drift is not None and len(shared) >= 5:
        vals = sorted(judged_all.values())
        median_judged = vals[len(vals) // 2]
        print(f"{'':32s} pack median norm = x{median_judged:4.2f}"
              " (uniform shift = probe artifact)")
    regressions = []
    for q in shared:
        ratio = ratios[q]
        judged = judged_all[q]
        corroborated = True
        if median_judged is not None:
            corroborated = (
                ratio > args.threshold
                or judged / median_judged > args.threshold
            )
        flag = ""
        if judged > args.threshold and q in SCOPE_GROWTH:
            flag = f" scope-growth ({SCOPE_GROWTH[q]})"
        elif judged > args.threshold and corroborated:
            flag = " REGRESSED"
            regressions.append(q)
        elif judged > args.threshold:
            flag = " probe-shift (norm over threshold, raw + pack flat)"
        elif judged < 1 / args.threshold:
            flag = " improved"
        if q in partial:
            # synthesized from a subset of the fold's constituents (a
            # partial run) — the ratio is not fold-vs-fold
            flag += " (partial fold)"
        norm = f"  norm x{judged:4.2f}" if drift else ""
        print(f"{q:32s} {old[q]:7.2f} -> {new[q]:7.2f}  x{ratio:4.2f}{norm}{flag}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print("dropped:", ", ".join(only_old))
    if only_new:
        print("added:  ", ", ".join(only_new))
    tot_o = sum(old[q] for q in shared)
    tot_n = sum(new[q] for q in shared)
    sub_norm = f"  norm x{tot_n / tot_o / drift:4.2f}" if drift else ""
    print(
        f"{'shared subtotal':32s} {tot_o:7.2f} -> {tot_n:7.2f}"
        f"  x{tot_n / tot_o:4.2f}{sub_norm}"
    )
    if regressions:
        print(
            f"\n{len(regressions)} over threshold — re-run both and compare "
            "minima before concluding (BASELINE.md noise rule)."
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
