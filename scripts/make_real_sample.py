"""Generate ``datasets/real_sample/sample.sdf``: a vendored set of REAL
molecules (literature connectivity, idealized planar/zigzag 3-D geometry at
standard bond lengths) used by tests/test_real_molecules.py to validate the
perception + featurization pipeline on actual chemistry — the surface the
round-1 verdict flagged as never exercised (conjugated-group detection,
`reference equihgnn/data/utils.py:35-54`, and a dataset process() body on a
raw file).

Heavy atoms only (implicit H via valence bookkeeping, as QM9-style raws
allow); aromatic rings use bond type 4.

    python scripts/make_real_sample.py
"""

import math
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "datasets", "real_sample", "sample.sdf")

CC, CAR, CD, CT = 1.54, 1.39, 1.34, 1.20  # single/aromatic/double/triple C-C
CN, CO, CF = 1.47, 1.43, 1.35


def ring(n, r):
    return [
        (r * math.cos(2 * math.pi * k / n), r * math.sin(2 * math.pi * k / n), 0.0)
        for k in range(n)
    ]


def hexagon():
    return ring(6, CAR / (2 * math.sin(math.pi / 6)))  # r = 1.39


def zigzag(n, d=1.45):
    """planar zigzag chain with ~120° angles."""
    pts, ang = [(0.0, 0.0, 0.0)], 0.0
    for k in range(1, n):
        ang = math.radians(30 if k % 2 else -30)
        x, y, _ = pts[-1]
        pts.append((x + d * math.cos(ang), y + d * math.sin(ang), 0.0))
    return pts


def mol(name, syms, pos, bonds, charges=()):
    """bonds: (i, j, order 1/2/3/4), 1-indexed in output."""
    lines = [name, "  equihgnn-tpu real sample", ""]
    lines.append(f"{len(syms):3d}{len(bonds):3d}  0  0  0  0  0  0  0  0999 V2000")
    for (x, y, z), s in zip(pos, syms):
        lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {s:<3s} 0  0  0  0  0  0  0  0  0  0  0  0")
    for i, j, t in bonds:
        lines.append(f"{i + 1:3d}{j + 1:3d}{t:3d}  0")
    if charges:
        ch = "".join(f" {i + 1:3d} {c:3d}" for i, c in charges)
        lines.append(f"M  CHG  {len(charges)}{ch}")
    lines.append("M  END")
    lines.append("$$$$")
    return "\n".join(lines)


def main():
    mols = []
    hx = hexagon()
    arom6 = [(k, (k + 1) % 6, 4) for k in range(6)]

    mols.append(mol("methane", ["C"], [(0, 0, 0)], []))
    mols.append(mol("ethane", ["C", "C"], [(0, 0, 0), (CC, 0, 0)], [(0, 1, 1)]))
    mols.append(mol("ethylene", ["C", "C"], [(0, 0, 0), (CD, 0, 0)], [(0, 1, 2)]))
    mols.append(mol("acetylene", ["C", "C"], [(0, 0, 0), (CT, 0, 0)], [(0, 1, 3)]))
    mols.append(mol("benzene", ["C"] * 6, hx, arom6))
    mols.append(
        mol("toluene", ["C"] * 7, hx + [(2.89, 0.0, 0.0)], arom6 + [(0, 6, 1)])
    )
    mols.append(
        mol(
            "styrene", ["C"] * 8,
            hx + [(2.87, 0.0, 0.0), (3.54, 1.16, 0.0)],
            arom6 + [(0, 6, 1), (6, 7, 2)],
        )
    )
    shift = 2 * 1.39 + 1.48
    mols.append(
        mol(
            "biphenyl", ["C"] * 12,
            hx + [(x + shift, y, 0.0) for x, y, _ in hx],
            arom6 + [(k + 6, (k + 1) % 6 + 6, 4) for k in range(6)] + [(0, 9, 1)],
        )
    )
    # naphthalene: 10 carbons, two fused aromatic rings sharing atoms 0-1
    nap = [
        (0.0, 0.695, 0.0), (0.0, -0.695, 0.0),
        (1.204, 1.39, 0.0), (2.408, 0.695, 0.0), (2.408, -0.695, 0.0),
        (1.204, -1.39, 0.0),
        (-1.204, 1.39, 0.0), (-2.408, 0.695, 0.0), (-2.408, -0.695, 0.0),
        (-1.204, -1.39, 0.0),
    ]
    nap_b = [
        (0, 1, 4), (0, 2, 4), (2, 3, 4), (3, 4, 4), (4, 5, 4), (5, 1, 4),
        (0, 6, 4), (6, 7, 4), (7, 8, 4), (8, 9, 4), (9, 1, 4),
    ]
    mols.append(mol("naphthalene", ["C"] * 10, nap, nap_b))
    mols.append(mol("pyridine", ["N"] + ["C"] * 5, hx, arom6))
    pent = ring(5, 1.36 / (2 * math.sin(math.pi / 5)))
    mols.append(
        mol("furan", ["O", "C", "C", "C", "C"], pent,
            [(k, (k + 1) % 5, 4) for k in range(5)])
    )
    bd = zigzag(4, 1.40)
    mols.append(
        mol("butadiene", ["C"] * 4, bd, [(0, 1, 2), (1, 2, 1), (2, 3, 2)])
    )
    pd = zigzag(5, 1.42)
    mols.append(
        mol("penta-1,4-diene", ["C"] * 5, pd,
            [(0, 1, 2), (1, 2, 1), (2, 3, 1), (3, 4, 2)])
    )
    mols.append(
        mol("formamide", ["N", "C", "O"],
            [(0, 0, 0), (1.36, 0, 0), (1.97, 1.07, 0)],
            [(0, 1, 1), (1, 2, 2)])
    )
    mols.append(
        mol("acetone", ["C", "C", "O", "C"],
            [(0, 0, 0), (1.52, 0, 0), (2.13, 1.05, 0), (2.26, -1.28, 0)],
            [(0, 1, 1), (1, 2, 2), (1, 3, 1)])
    )
    mols.append(
        mol("acetic acid", ["C", "C", "O", "O"],
            [(0, 0, 0), (1.50, 0, 0), (2.11, 1.04, 0), (2.16, -1.22, 0)],
            [(0, 1, 1), (1, 2, 2), (1, 3, 1)])
    )
    mols.append(
        mol("acrylonitrile", ["C", "C", "C", "N"],
            [(0, 0, 0), (1.34, 0, 0), (2.06, 1.19, 0), (2.65, 2.14, 0)],
            [(0, 1, 2), (1, 2, 1), (2, 3, 3)])
    )
    mols.append(
        mol("fluorobenzene", ["C"] * 6 + ["F"], hx + [(2.74, 0, 0)],
            arom6 + [(0, 6, 1)])
    )
    mols.append(
        mol("aniline", ["C"] * 6 + ["N"], hx + [(2.80, 0, 0)],
            arom6 + [(0, 6, 1)])
    )
    mols.append(
        mol("phenol", ["C"] * 6 + ["O"], hx + [(2.75, 0, 0)],
            arom6 + [(0, 6, 1)])
    )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        fh.write("\n".join(mols) + "\n")
    print(f"wrote {len(mols)} molecules to {OUT}")


if __name__ == "__main__":
    main()
