#!/usr/bin/env python3
"""Plot pre/post-update state traces (the reference's Log/plot.py over
mat_pre.txt / mat_out.txt). Usage:
  python scripts/plot_states.py mat_pre.txt mat_out.txt [out.png]
Columns: t, euler(3, deg), pos(3), vel(3), bias_g(3), bias_a(3), inv_expo.
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    pre = np.loadtxt(sys.argv[1])
    post = np.loadtxt(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "states.png"
    names = [
        ("attitude (deg)", slice(1, 4)),
        ("position (m)", slice(4, 7)),
        ("velocity (m/s)", slice(7, 10)),
        ("gyro bias", slice(10, 13)),
        ("acc bias", slice(13, 16)),
        ("inv exposure", slice(16, 17)),
    ]
    fig, axes = plt.subplots(3, 2, figsize=(13, 9), sharex=True)
    for ax, (title, sl) in zip(axes.flat, names):
        for k in range(sl.stop - sl.start):
            ax.plot(pre[:, 0], pre[:, sl.start + k], "--", lw=0.8, alpha=0.6)
            ax.plot(post[:, 0], post[:, sl.start + k], lw=1.0)
        ax.set_title(title + "  (dashed=pre, solid=post)")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
