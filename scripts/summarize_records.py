"""Summarize the cookie / frostt sweep CSVs into PARITY.md-ready tables.

Usage: python scripts/summarize_records.py [cookie|frostt|scaling|dimscale]
"""
from __future__ import annotations

import csv
import statistics
import sys
from collections import defaultdict
from pathlib import Path

RES = Path(__file__).resolve().parent.parent / "results"


def _med(xs):
    return statistics.median(xs)


def cookie() -> None:
    rows = list(csv.DictReader(open(RES / "cookie.csv")))
    g = defaultdict(lambda: defaultdict(list))
    for r in rows:
        g[(r["rounding_method"], float(r["max_rank"]))]["t"].append(
            float(r["time_taken"])
        )
        g[(r["rounding_method"], float(r["max_rank"]))]["e"].append(
            float(r["error"])
        )
    ranks = sorted({k[1] for k in g})
    print("| max_rank | sketch med wall (n) | pairwise med wall (n) | "
          "ratio | sketch med resid | pairwise med resid |")
    print("|---|---|---|---|---|---|")
    for rk in ranks:
        s = g.get(("sketch", rk))
        p = g.get(("pairwise", rk))
        st = _med(s["t"]) if s else float("nan")
        pt = _med(p["t"]) if p else None
        ratio = f"{pt / st:.1f}x" if p else "-"
        se = _med(s["e"]) if s else float("nan")
        pe = f"{_med(p['e']):.1e}" if p else "-"
        pn = len(p["t"]) if p else 0
        print(
            f"| {int(rk)} | {st:.0f} s ({len(s['t'])}) | "
            + (f"{pt:.0f} s ({pn}) | " if p else "- | ")
            + f"{ratio} | {se:.1e} | {pe} |"
        )


def frostt() -> None:
    rows = list(csv.DictReader(open(RES / "frostt.csv")))
    g = defaultdict(lambda: defaultdict(list))
    for r in rows:
        if not r["error"]:
            continue  # NaN recorded as blank by the runner
        rank = r["rank"] or r["left_rank"]
        dt = "f32/TPU" if r.get("dtype") == "float32" else "f64/CPU"
        key = (r["dataset"], r["name"], int(float(rank)), dt)
        g[key]["e"].append(float(r["error"]))
        g[key]["t"].append(float(r["time_taken"]))
    print("| dataset | alg | rank | path | med sample err (n) | med wall |")
    print("|---|---|---|---|---|---|")
    for (ds, alg, rk, dt) in sorted(g):
        v = g[(ds, alg, rk, dt)]
        print(
            f"| {ds} | {alg} | {rk} | {dt} | {_med(v['e']):.3f} "
            f"({len(v['e'])}) | {_med(v['t']):.1f} s |"
        )


def cookie_tpu() -> None:
    rows = list(csv.DictReader(open(RES / "cookie_tpu.csv")))
    g = defaultdict(lambda: defaultdict(list))
    for r in rows:
        g[(r["rounding_method"], float(r["max_rank"]))]["t"].append(
            float(r["time_taken"])
        )
        g[(r["rounding_method"], float(r["max_rank"]))]["e"].append(
            float(r["error"])
        )
    ranks = sorted({k[1] for k in g})
    print("| max_rank | sketch med wall (n) | pairwise med wall (n) | "
          "ratio | sketch med resid | pairwise med resid |")
    print("|---|---|---|---|---|---|")
    for rk in ranks:
        st = g.get(("sketch", rk))
        pt = g.get(("pairwise", rk))
        sw = _med(st["t"]) if st else None
        pw = _med(pt["t"]) if pt else None
        print(
            f"| {int(rk)} | "
            + (f"{sw:.1f} s ({len(st['t'])}) | " if st else "- | ")
            + (f"{pw:.1f} s ({len(pt['t'])}) | " if pt else "- | ")
            + (f"{pw / sw:.1f}x | " if st and pt else "- | ")
            + (f"{_med(st['e']):.1e} | " if st else "- | ")
            + (f"{_med(pt['e']):.1e} |" if pt else "- |")
        )


def final_round() -> None:
    """Final-rounding rank sweep (reference do_cookie.py:66-85): median
    true residual of the rounded solution vs final rank, from the
    highest-max_rank solves of each method."""
    import json as _json

    rows = [
        r for r in csv.DictReader(open(RES / "cookie.csv"))
        if r.get("final_round_ranks")
    ]
    for solve_m in ("sketch", "pairwise"):
        sel = [r for r in rows if r["rounding_method"] == solve_m]
        if not sel:
            continue
        top = max(float(r["max_rank"]) for r in sel)
        sel = [r for r in sel if float(r["max_rank"]) == top]
        # Rows may carry different final_round_ranks grids (quick-mode
        # (4, 8) rows next to the full 10..100 sweep); medians must only
        # pair errors from the same grid — keep the majority grid.
        grids = defaultdict(list)
        for r in sel:
            grids[r["final_round_ranks"]].append(r)
        sel = max(grids.values(), key=len)
        ranks = _json.loads(sel[0]["final_round_ranks"])
        print(f"\nsolve={solve_m} max_rank={int(top)} (n={len(sel)} runs)")
        print("| final rank | true resid (final=sketch) | "
              "true resid (final=pairwise) |")
        print("|---|---|---|")
        for i, fr in enumerate(ranks):
            es = _med([_json.loads(r["final_true_error_sketch"])[i]
                       for r in sel])
            ep = _med([_json.loads(r["final_true_error_pairwise"])[i]
                       for r in sel])
            print(f"| {fr} | {es:.2e} | {ep:.2e} |")


def scaling() -> None:
    for r in csv.DictReader(open(RES / "scaling.csv")):
        print(r)


def dimscale() -> None:
    rows = list(csv.DictReader(open(RES / "dimension_scaling.csv")))
    g = defaultdict(lambda: defaultdict(list))
    for r in rows:
        stream = r.get("drm_stream") or "jax"
        g[(stream, r["name"], int(float(r["order"])))]["e"].append(
            float(r["error"])
        )
        g[(stream, r["name"], int(float(r["order"])))]["t"].append(
            float(r["time_taken"])
        )
    print("| stream | alg | order | med rel err (n) | med wall |")
    print("|---|---|---|---|---|")
    for k in sorted(g):
        v = g[k]
        print(
            f"| {k[0]} | {k[1]} | {k[2]} | {_med(v['e']):.2e} "
            f"({len(v['e'])}) | {_med(v['t']):.0f} s |"
        )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "cookie"
    {"cookie": cookie, "frostt": frostt, "scaling": scaling,
     "dimscale": dimscale, "cookie_tpu": cookie_tpu,
     "final_round": final_round}[which]()
