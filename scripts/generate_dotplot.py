#!/usr/bin/env python
"""Dot plot of mashmap output.

Equivalent of the reference's scripts/generateDotPlot (perl + gnuplot):
lays out all reference sequences on X and all query sequences on Y
(ordered by total aligned length, largest first) and draws one segment
per mapping, forward in one color, reverse in another. Output is a
standalone SVG (no gnuplot/matplotlib dependency).

Usage: generate_dotplot.py <mappings.paf-or-legacy> [out.svg]
"""

import sys


def parse(path):
    rows = []
    with open(path) as fh:
        for line in fh:
            f = line.split()
            if len(f) < 9:
                continue
            rows.append(dict(
                q=f[0], qlen=int(f[1]), qs=int(f[2]), qe=int(f[3]),
                strand=f[4], r=f[5], rlen=int(f[6]), rs=int(f[7]),
                re=int(f[8])))
    return rows


def layout(rows):
    rtot, qtot = {}, {}
    rlen, qlen = {}, {}
    for m in rows:
        rtot[m["r"]] = rtot.get(m["r"], 0) + m["re"] - m["rs"]
        qtot[m["q"]] = qtot.get(m["q"], 0) + m["qe"] - m["qs"]
        rlen[m["r"]] = m["rlen"]
        qlen[m["q"]] = m["qlen"]
    rorder = sorted(rlen, key=lambda n: -rtot[n])
    qorder = sorted(qlen, key=lambda n: -qtot[n])
    roff, acc = {}, 0
    for n in rorder:
        roff[n] = acc
        acc += rlen[n]
    rtotal = acc
    qoff, acc = {}, 0
    for n in qorder:
        qoff[n] = acc
        acc += qlen[n]
    return roff, rtotal, qoff, acc, rorder, qorder, rlen, qlen


def main(argv):
    if len(argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    rows = parse(argv[1])
    if not rows:
        print("no mappings to plot", file=sys.stderr)
        return 1
    out = argv[2] if len(argv) > 2 else "out.svg"
    roff, rtot, qoff, qtot, rorder, qorder, rlen, qlen = layout(rows)
    W = H = 800
    M = 60

    def x(v):
        return M + (W - 2 * M) * v / max(rtot, 1)

    def y(v):
        return H - M - (H - 2 * M) * v / max(qtot, 1)

    svg = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" '
           f'height="{H}" viewBox="0 0 {W} {H}">',
           f'<rect width="{W}" height="{H}" fill="white"/>']
    # grid lines at sequence boundaries
    for n in rorder:
        px = x(roff[n])
        svg.append(f'<line x1="{px:.1f}" y1="{M}" x2="{px:.1f}" '
                   f'y2="{H - M}" stroke="#ddd"/>')
    for n in qorder:
        py = y(qoff[n])
        svg.append(f'<line x1="{M}" y1="{py:.1f}" x2="{W - M}" '
                   f'y2="{py:.1f}" stroke="#ddd"/>')
    svg.append(f'<rect x="{M}" y="{M}" width="{W - 2 * M}" '
               f'height="{H - 2 * M}" fill="none" stroke="black"/>')
    for m in rows:
        x1 = x(roff[m["r"]] + m["rs"])
        x2 = x(roff[m["r"]] + m["re"])
        if m["strand"] == "+":
            y1 = y(qoff[m["q"]] + m["qs"])
            y2 = y(qoff[m["q"]] + m["qe"])
            color = "#d62728"
        else:
            y1 = y(qoff[m["q"]] + m["qe"])
            y2 = y(qoff[m["q"]] + m["qs"])
            color = "#1f77b4"
        svg.append(f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" '
                   f'y2="{y2:.1f}" stroke="{color}" stroke-width="1.5"/>')
    svg.append(f'<text x="{W / 2}" y="{H - 15}" text-anchor="middle" '
               f'font-size="13">reference</text>')
    svg.append(f'<text x="15" y="{H / 2}" text-anchor="middle" '
               f'font-size="13" transform="rotate(-90 15 {H / 2})">'
               f'query</text>')
    svg.append("</svg>")
    with open(out, "w") as fh:
        fh.write("\n".join(svg))
    print(f"wrote {out} ({len(rows)} mappings, {len(rorder)} ref seqs, "
          f"{len(qorder)} query seqs)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
