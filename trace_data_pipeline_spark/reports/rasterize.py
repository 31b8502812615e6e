"""Pure-numpy chart rasterizer: the matplotlib-free backend for the
report sink's per-entity figure pages.

The reference renders per-CUSIP error pages with matplotlib
(`stage0/_error_plot_helpers.py:1-455`). This container ships no
matplotlib, so `reports.render.render_figures` falls back to this
module: the same panel (full price series, corrected overlay, flagged
markers, axes, gridlines, tick labels, legend, title) drawn into an
RGB numpy buffer and encoded with the repo's own PNG codec
(`datapipe/png.py`) — real, decodable pages with zero third-party
dependencies. A deployment with matplotlib installed still gets the
matplotlib pages; this is the always-available floor, not a fork of
the contract.

Scope: this is a REPORT-PAGE renderer (a few hundred points per
entity, driver-side by design — the figure data was already reduced
and partitioned by Spark), not a plotting library. Text is a built-in
5x7 uppercase bitmap font: enough for titles, numeric tick labels and
legend words; anything outside its charset renders as a blank cell
rather than raising mid-report.
"""

from __future__ import annotations

import numpy as np

from trace_data_pipeline_spark.datapipe.png import encode_png

# 5x7 bitmap glyphs ('#' = lit). Uppercase + digits + the charset
# numeric tick labels can emit ({:.4g} -> digits, '.', '-', '+', 'E').
_GLYPHS = {
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "2": (".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    "3": (".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": ("..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."),
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".####"),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": (".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "J": ("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    ".": (".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
    "-": (".....", ".....", ".....", ".###.", ".....", ".....", "....."),
    "+": (".....", "..#..", "..#..", "#####", "..#..", "..#..", "....."),
    ":": (".....", ".##..", ".##..", ".....", ".##..", ".##..", "....."),
    "_": (".....", ".....", ".....", ".....", ".....", ".....", "#####"),
    "=": (".....", ".....", "#####", ".....", "#####", ".....", "....."),
    " ": (".....", ".....", ".....", ".....", ".....", ".....", "....."),
}

_GLYPH_W, _GLYPH_H = 5, 7

BG = (255, 255, 255)
AXIS = (40, 40, 40)
GRID = (222, 222, 222)
COLOR_ALL = (158, 190, 228)  # light blue — the raw series
COLOR_CORRECTED = (31, 119, 180)  # solid blue — corrected overlay
COLOR_FLAGGED = (214, 39, 40)  # red X markers


def text_width(text: str, scale: int = 1) -> int:
    return len(text) * (_GLYPH_W + 1) * scale


def blit_text(img, x: int, y: int, text: str, color, scale: int = 1) -> None:
    """Draw `text` with the 5x7 font, top-left corner at (x, y).
    Unknown characters (after uppercasing) render as blanks."""
    h, w, _ = img.shape
    cx = x
    for ch in text.upper():
        rows = _GLYPHS.get(ch)
        if rows is not None:
            for gy, row in enumerate(rows):
                for gx, cell in enumerate(row):
                    if cell != "#":
                        continue
                    y0, x0 = y + gy * scale, cx + gx * scale
                    # clamp BOTH slice ends at 0: a cell fully off-canvas
                    # left/top (x0 + scale <= 0) would otherwise produce a
                    # negative stop, which Python wraps around to paint a
                    # near-full-width band (r11 ADVICE — reachable with
                    # centered titles longer than the canvas)
                    img[
                        max(0, y0) : max(0, min(h, y0 + scale)),
                        max(0, x0) : max(0, min(w, x0 + scale)),
                    ] = color
        cx += (_GLYPH_W + 1) * scale


def draw_line(img, x0, y0, x1, y1, color, thickness: int = 1) -> None:
    """Interpolated segment draw (dense enough to be gap-free at any
    slope), with square thickness."""
    h, w, _ = img.shape
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.rint(np.linspace(x0, x1, n)).astype(int)
    ys = np.rint(np.linspace(y0, y1, n)).astype(int)
    for dy in range(thickness):
        for dx in range(thickness):
            xi = np.clip(xs + dx, 0, w - 1)
            yi = np.clip(ys + dy, 0, h - 1)
            img[yi, xi] = color


def draw_marker_x(img, x: int, y: int, color, r: int = 3) -> None:
    draw_line(img, x - r, y - r, x + r, y + r, color, thickness=2)
    draw_line(img, x - r, y + r, x + r, y - r, color, thickness=2)


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    if not np.isfinite(lo) or not np.isfinite(hi) or lo == hi:
        lo, hi = lo - 1.0, hi + 1.0
    return list(np.linspace(lo, hi, n))


def _legend_origin(width: int, height: int) -> tuple[int, int]:
    """Top-left of the legend's first key line (inside the plot's
    top-right corner)."""
    right, top = width - 20, 40
    return right - 150, top + 6


def legend_bbox(width: int, height: int) -> tuple[int, int, int, int]:
    """(y0, y1, x0, x1) rectangle covering everything the legend draws
    (keys, markers, labels) with a small pad. ONE source of truth with
    the renderer: tests that must ignore the legend's unconditional
    series-color pixels blank exactly this region instead of
    hardcoding the geometry (round-12 review)."""
    lx, ly = _legend_origin(width, height)
    return (
        ly - 4,
        ly + 2 * 12 + _GLYPH_H + 4,  # 3 entries at 12px pitch
        lx - 4,
        lx + 26 + text_width("CORRECTED") + 4,  # widest label
    )


def render_series_panel(
    rows,
    title: str,
    width: int = 1000,
    height: int = 400,
) -> np.ndarray:
    """Render one figure panel into an (height, width, 3) uint8 buffer.

    `rows` is the sorted per-entity figure data the report sink loads
    from disk: (date_str, p_before, p_after, flag) tuples — the exact
    frame the reference's `_plot_panel` consumes. The panel: the raw
    series in light blue, the corrected series in solid blue, a red X
    on every flagged point, 5 y-gridlines with numeric labels, %Y-%m
    date x-ticks, legend, centered title."""
    img = np.full((height, width, 3), BG, dtype=np.uint8)
    left, right = 70, width - 20
    top, bottom = 40, height - 45

    p_before = np.array([r[1] for r in rows], dtype=float)
    p_after = np.array([r[2] for r in rows], dtype=float)
    flags = np.array([int(r[3]) for r in rows])
    both = np.concatenate([p_before, p_after])
    both = both[np.isfinite(both)]
    lo = float(both.min()) if both.size else 0.0
    hi = float(both.max()) if both.size else 1.0
    pad = (hi - lo) * 0.05 or 1.0
    lo, hi = lo - pad, hi + pad

    def sx(i: int) -> float:
        if len(rows) <= 1:
            return (left + right) / 2
        return left + (right - left) * i / (len(rows) - 1)

    def sy(v: float) -> float:
        return bottom - (bottom - top) * (v - lo) / (hi - lo)

    # gridlines + y tick labels (right-aligned into the left margin)
    for tv in _ticks(lo, hi):
        yy = int(round(sy(tv)))
        draw_line(img, left, yy, right, yy, GRID)
        label = f"{tv:.4g}"
        blit_text(img, left - 6 - text_width(label), yy - 3, label, AXIS)
    # x tick labels: abbreviated DATES at integer rank positions — the
    # reference's rank-spaced axis formats tick dates as %Y-%m
    # (`stage0/_error_plot_helpers.py:102-123`); rows[i][0] already
    # carries the ISO date string, so YYYY-MM is its first 7 chars
    for i in np.linspace(0, len(rows) - 1, min(5, len(rows))):
        xi = int(round(sx(int(i))))
        draw_line(img, xi, bottom, xi, bottom + 4, AXIS)
        label = str(rows[int(i)][0])[:7]
        # center on the tick, but keep the whole label on-canvas (the
        # rightmost tick sits at width-20; an unclamped centered label
        # would lose its last glyph column)
        lx = max(0, min(xi - text_width(label) // 2, width - text_width(label)))
        blit_text(img, lx, bottom + 8, label, AXIS)
    # axes
    draw_line(img, left, top, left, bottom, AXIS)
    draw_line(img, left, bottom, right, bottom, AXIS)

    # series — the 2px corrected band first, then the 1px raw core on
    # top: where the two coincide (the common case — corrections touch
    # few points) BOTH stay visible (the band's border pixels frame the
    # raw core) instead of the later line overdrawing the earlier one
    # entirely, which on wide y-ranges erased the raw series from the
    # plot area altogether. The reference gets the same effect from
    # alpha blending (`_error_plot_helpers.py` plots raw at alpha=.5).
    for series, color, thickness in (
        (p_after, COLOR_CORRECTED, 2),
        (p_before, COLOR_ALL, 1),
    ):
        for i in range(len(rows) - 1):
            if np.isfinite(series[i]) and np.isfinite(series[i + 1]):
                draw_line(
                    img,
                    sx(i),
                    sy(series[i]),
                    sx(i + 1),
                    sy(series[i + 1]),
                    color,
                    thickness,
                )
    for i in np.nonzero(flags)[0]:
        if np.isfinite(p_before[i]):
            draw_marker_x(
                img, int(round(sx(int(i)))), int(round(sy(p_before[i]))),
                COLOR_FLAGGED,
            )

    # title + legend
    blit_text(
        img, (width - text_width(title, 2)) // 2, 10, title, AXIS, scale=2
    )
    lx, ly = _legend_origin(width, height)
    for label, color in (
        ("ALL", COLOR_ALL),
        ("CORRECTED", COLOR_CORRECTED),
        ("FLAGGED", COLOR_FLAGGED),
    ):
        if label == "FLAGGED":
            draw_marker_x(img, lx + 10, ly + 3, color, r=3)
        else:
            draw_line(img, lx, ly + 3, lx + 20, ly + 3, color, thickness=2)
        blit_text(img, lx + 26, ly, label, AXIS)
        ly += 12

    return img


def render_series_page(
    rows,
    title: str,
    width: int = 1000,
    height: int = 400,
) -> bytes:
    """Render one single-panel figure page and return PNG bytes."""
    img = render_series_panel(rows, title, width, height)
    return encode_png(img.tobytes(), width, height, 3)


def compose_pages(
    panels: list[np.ndarray], per_page: int = 4, cols: int = 2
) -> list[np.ndarray]:
    """Tile rendered panel buffers into multi-panel page buffers — the
    reference composes its A4 figures as a (rows x cols) grid of
    per-CUSIP subplots, one page per `per_page` entities
    (`stage0/_error_plot_helpers.py:281-455`). Pages fill row-major;
    the last page pads missing cells with background. Returns
    ceil(len(panels) / per_page) page buffers."""
    if per_page < 1:
        raise ValueError(f"per_page must be >= 1, got {per_page}")
    if not panels:
        return []
    ph, pw, _ = panels[0].shape
    for p in panels:
        if p.shape != (ph, pw, 3):
            raise ValueError(
                f"all panels must share one shape; got {p.shape} vs "
                f"{(ph, pw, 3)}"
            )
    cols = min(cols, per_page)
    grid_rows = -(-per_page // cols)
    pages: list[np.ndarray] = []
    for start in range(0, len(panels), per_page):
        page = np.full((ph * grid_rows, pw * cols, 3), BG, dtype=np.uint8)
        for k, panel in enumerate(panels[start : start + per_page]):
            r, c = divmod(k, cols)
            page[r * ph : (r + 1) * ph, c * pw : (c + 1) * pw] = panel
        pages.append(page)
    return pages
