"""Renders the literature-scale cheetah learning curve to docs/media/*.svg.

Two series (Gradient+BC 300-episode run vs the CEM mean-propagation baseline), raw
per-episode rewards as a faint line with a 10-episode rolling mean as the 2px main
line. Static SVG committed into docs/ (the docs tree renders markdown + images, so
the table view lives in docs/performance.md's milestone table next to the figure).

  python benchmarks/plot_cheetah_curve.py [--out docs/media/cheetah_300ep_curve.svg]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Validated reference palette (dataviz skill, documented adjacent order), light mode.
SERIES_1 = "#2a78d6"  # blue — Gradient + BC proposer
SERIES_2 = "#eb6834"  # orange — CEM baseline (mean propagation)
SURFACE = "#fcfcfb"
TEXT_PRIMARY = "#0b0b0b"
TEXT_SECONDARY = "#52514e"
GRID = "#e8e8e6"


def episodes(path):
    eps = []
    with open(os.path.join(ROOT, path)) as f:
        for line in f:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if row.get("tag") == "rewards/actual_episode_reward":
                eps.append(float(row["value"]))
    return np.asarray(eps)


def rolling(x, w=10):
    if len(x) < w:
        return x.copy()
    c = np.convolve(x, np.ones(w) / w, mode="valid")
    # Left-pad with the partial-window means so the series starts at episode 1.
    head = np.array([x[: i + 1].mean() for i in range(w - 1)])
    return np.concatenate([head, c])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="benchmarks/cheetah_gradient_bc_300ep_run.jsonl")
    p.add_argument("--baseline", default="benchmarks/cheetah_mean_run.jsonl")
    p.add_argument("--out", default="docs/media/cheetah_300ep_curve.svg")
    args = p.parse_args()

    gbc = episodes(args.run)
    cem = episodes(args.baseline)
    if len(gbc) == 0:
        sys.exit("no episodes in " + args.run)

    fig, ax = plt.subplots(figsize=(8.4, 4.2), dpi=100)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    x1 = np.arange(1, len(gbc) + 1)
    ax.plot(x1, gbc, color=SERIES_1, lw=0.8, alpha=0.25, solid_joinstyle="round")
    ax.plot(x1, rolling(gbc), color=SERIES_1, lw=2.0, solid_capstyle="round",
            solid_joinstyle="round", label="Gradient + BC proposer")
    if len(cem):
        x2 = np.arange(1, len(cem) + 1)
        ax.plot(x2, cem, color=SERIES_2, lw=0.8, alpha=0.25, solid_joinstyle="round")
        ax.plot(x2, rolling(cem), color=SERIES_2, lw=2.0, solid_capstyle="round",
                solid_joinstyle="round", label="CEM (mean propagation)")

    # Selective direct labels: the peak of the headline series, and each line's end.
    peak_i = int(np.argmax(gbc))
    ax.scatter([peak_i + 1], [gbc[peak_i]], s=64, color=SERIES_1, zorder=5,
               edgecolors=SURFACE, linewidths=2)
    ax.annotate(f"peak {gbc[peak_i]:,.0f}", (peak_i + 1, gbc[peak_i]),
                textcoords="offset points", xytext=(6, 8),
                fontsize=9, color=TEXT_PRIMARY)
    end_avg = rolling(gbc)[-1]
    ax.annotate(f"{end_avg:,.0f} (10-ep mean)", (len(gbc), end_avg),
                textcoords="offset points", xytext=(6, -2),
                fontsize=9, color=TEXT_SECONDARY)

    ax.set_xlim(0, len(gbc) * 1.14)  # headroom so the end label never clips
    ax.set_xlabel("episode (200 env steps each)", fontsize=9, color=TEXT_SECONDARY)
    ax.set_ylabel("episode reward", fontsize=9, color=TEXT_SECONDARY)
    ax.set_title(
        f"HalfCheetah MBRL: Gradient + BC proposer, {len(gbc)}-episode run "
        "(seed 0, one v5e)",
        fontsize=11, color=TEXT_PRIMARY, loc="left", pad=12,
    )
    ax.grid(True, color=GRID, lw=1.0)
    ax.set_axisbelow(True)
    for spine in ax.spines.values():
        spine.set_visible(False)
    ax.tick_params(colors=TEXT_SECONDARY, labelsize=8, length=0)
    leg = ax.legend(loc="upper left", frameon=False, fontsize=9)
    for t in leg.get_texts():
        t.set_color(TEXT_PRIMARY)

    out = os.path.join(ROOT, args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, format=out.rsplit(".",1)[-1], facecolor=SURFACE)
    print(json.dumps({"out": args.out, "episodes": int(len(gbc)),
                      "peak": round(float(gbc.max()), 1),
                      "final_10ep_mean": round(float(end_avg), 1)}))


if __name__ == "__main__":
    main()
