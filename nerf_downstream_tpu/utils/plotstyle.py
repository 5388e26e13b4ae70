"""Opinionated default plotting style (reference co3d_3d/src/__init__.py:14-47).

The reference applies these rcParams as an import side effect of its package
root; here it's an explicit opt-in (``apply_plot_style()``) so importing the
framework never mutates global matplotlib state. The reference's
"seaborn-colorblind" style name was removed in modern matplotlib — the
renamed "seaborn-v0_8-colorblind" is tried first, falling back cleanly.
"""

from __future__ import annotations

DEFAULT_FIGSIZE = 8
MARKERS = "oxP.X"
DEFAULT_LINEWIDTH = 3
DEFAULT_FONTSIZE = 22


def apply_plot_style():
    import matplotlib as mpl
    import matplotlib.style

    for style in ("seaborn-v0_8-colorblind", "seaborn-colorblind"):
        try:
            mpl.style.use(style)
            break
        except OSError:
            continue
    mpl.rcParams["figure.facecolor"] = "w"
    mpl.rcParams.update(
        {
            "grid.color": "k",
            "grid.linestyle": ":",
            "errorbar.capsize": 2,
            "image.cmap": "cividis",
            "grid.linewidth": 0.5,
            "lines.markersize": 6,
            "axes.grid": True,
            "font.size": DEFAULT_FONTSIZE,
            "lines.linewidth": DEFAULT_LINEWIDTH,
            "legend.fontsize": DEFAULT_FONTSIZE,
            "axes.labelsize": DEFAULT_FONTSIZE,
            "xtick.labelsize": DEFAULT_FONTSIZE,
            "ytick.labelsize": DEFAULT_FONTSIZE,
            "figure.figsize": (7, 7.0 / 1.4),
        }
    )
    return [c["color"] for c in mpl.rcParams["axes.prop_cycle"]]
