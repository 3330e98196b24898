"""Duck-typed fake RDKit objects, so featurize.py and every dataset
``process()`` body run in RDKit-free CI.

Only the attribute surface actually consumed by `equihgnn_tpu.data.featurize`
and the dataset classes is implemented (SURVEY §2.3/§2.4; reference
`equihgnn/data/utils.py:35-147`). Fake molecules are constructed to mirror
RDKit's real outputs for the same structures (the benzene golden below equals
what RDKit produces for ``c1ccccc1``), so goldens stay meaningful.
"""

from __future__ import annotations

import numpy as np


class FakeAtom:
    def __init__(
        self,
        atomic_num=6,
        chiral_tag="CHI_UNSPECIFIED",
        total_degree=4,
        formal_charge=0,
        total_num_hs=0,
        num_radical_electrons=0,
        hybridization="SP3",
        is_aromatic=False,
        in_ring=False,
        symbol=None,
    ):
        self._d = dict(
            atomic_num=atomic_num,
            chiral_tag=chiral_tag,
            total_degree=total_degree,
            formal_charge=formal_charge,
            total_num_hs=total_num_hs,
            num_radical_electrons=num_radical_electrons,
            hybridization=hybridization,
            is_aromatic=is_aromatic,
            in_ring=in_ring,
            symbol=symbol or {1: "H", 6: "C", 7: "N", 8: "O", 9: "F"}.get(atomic_num, "X"),
        )

    def GetAtomicNum(self):
        return self._d["atomic_num"]

    def GetChiralTag(self):
        return self._d["chiral_tag"]

    def GetTotalDegree(self):
        return self._d["total_degree"]

    def GetFormalCharge(self):
        return self._d["formal_charge"]

    def GetTotalNumHs(self):
        return self._d["total_num_hs"]

    def GetNumRadicalElectrons(self):
        return self._d["num_radical_electrons"]

    def GetHybridization(self):
        return self._d["hybridization"]

    def GetIsAromatic(self):
        return self._d["is_aromatic"]

    def IsInRing(self):
        return self._d["in_ring"]

    def GetSymbol(self):
        return self._d["symbol"]


class FakeBond:
    def __init__(self, i, j, bond_type="SINGLE", stereo="STEREONONE", conjugated=False):
        self.i, self.j = i, j
        self.bond_type, self.stereo, self.conjugated = bond_type, stereo, conjugated

    def GetBeginAtomIdx(self):
        return self.i

    def GetEndAtomIdx(self):
        return self.j

    def GetBondType(self):
        return self.bond_type

    def GetStereo(self):
        return self.stereo

    def GetIsConjugated(self):
        return self.conjugated


class FakeConformer:
    def __init__(self, pos):
        self.pos = np.asarray(pos, dtype=np.float64)

    def GetPositions(self):
        return self.pos


class FakeMol:
    """atoms: list[FakeAtom]; bonds: list[FakeBond]; conj_grp: per-atom group
    id (-1 / huge unsigned for non-conjugated atoms, as some RDKit builds
    return — reference guards `-1 < g < num_he`, `utils.py:44-53`)."""

    def __init__(self, atoms, bonds, conj_grp=None, pos=None, rings=()):
        self.atoms, self.bonds = atoms, bonds
        self.conj_grp = conj_grp if conj_grp is not None else [-1] * len(atoms)
        self.conformer = FakeConformer(pos) if pos is not None else None
        self.rings = tuple(tuple(r) for r in rings)

    def GetAtoms(self):
        return self.atoms

    def GetBonds(self):
        return self.bonds

    def GetNumAtoms(self):
        return len(self.atoms)

    def GetAtomWithIdx(self, i):
        return self.atoms[i]

    def GetConformer(self):
        if self.conformer is None:
            raise ValueError("no conformer (malformed molecule)")
        return self.conformer

    def GetRingInfo(self):
        mol = self

        class _RI:
            def AtomRings(self):
                return mol.rings

        return _RI()


class _FakeResonanceSupplier:
    def __init__(self, mol):
        self.mol = mol

    def GetNumConjGrps(self):
        real = [g for g in self.mol.conj_grp if 0 <= g < 2**31]
        return max(real) + 1 if real else 0

    def GetAtomConjGrpIdx(self, i):
        return self.mol.conj_grp[i]


class _Hyb:
    SP = "SP"
    SP2 = "SP2"
    SP3 = "SP3"


class FakeChem:
    """Drop-in for the `Chem` module surface the framework consumes.

    File-backed suppliers read from class-level registries keyed by path /
    SMILES / mol-block string — register inputs with the helpers below.
    """

    HybridizationType = _Hyb

    _sdf_registry: dict[str, list] = {}
    _smiles_registry: dict[str, FakeMol | None] = {}
    _molblock_registry: dict[str, FakeMol | None] = {}

    # ------------------------------------------------------------ registration
    @classmethod
    def register_sdf(cls, path, mols):
        cls._sdf_registry[str(path)] = list(mols)

    @classmethod
    def register_smiles(cls, smi, mol):
        cls._smiles_registry[smi] = mol

    @classmethod
    def register_molblock(cls, block, mol):
        cls._molblock_registry[block] = mol

    @classmethod
    def clear(cls):
        cls._sdf_registry.clear()
        cls._smiles_registry.clear()
        cls._molblock_registry.clear()

    # ---------------------------------------------------------------- Chem API
    @classmethod
    def SDMolSupplier(cls, path, removeHs=True, sanitize=True):
        return list(cls._sdf_registry[str(path)])

    @classmethod
    def MolFromSmiles(cls, smi):
        return cls._smiles_registry.get(smi)

    @classmethod
    def MolFromMolBlock(cls, block, removeHs=True, sanitize=True):
        return cls._molblock_registry.get(block)

    @classmethod
    def ResonanceMolSupplier(cls, mol):
        return _FakeResonanceSupplier(mol)


# ------------------------------------------------------------ stock molecules
def benzene(with_pos=False):
    """c1ccccc1 — mirrors RDKit: 6 aromatic SP2 carbons (1 implicit H each,
    total degree 3), 6 AROMATIC ring bonds, one conjugated group over all six
    atoms. Golden atom feature: [5, 0, 3, 5, 1, 0, 1, 1, 1]."""
    atoms = [
        FakeAtom(6, total_degree=3, total_num_hs=1, hybridization="SP2",
                 is_aromatic=True, in_ring=True)
        for _ in range(6)
    ]
    bonds = [
        FakeBond(i, (i + 1) % 6, bond_type="AROMATIC", conjugated=True)
        for i in range(6)
    ]
    pos = None
    if with_pos:
        ang = np.arange(6) * np.pi / 3.0
        pos = np.stack([1.39 * np.cos(ang), 1.39 * np.sin(ang), np.zeros(6)], 1)
    return FakeMol(atoms, bonds, conj_grp=[0] * 6, pos=pos, rings=[tuple(range(6))])


def ethanol(with_pos=False):
    """CCO — 3 heavy atoms, 2 single bonds, no conjugation."""
    atoms = [
        FakeAtom(6, total_degree=4, total_num_hs=3),
        FakeAtom(6, total_degree=4, total_num_hs=2),
        FakeAtom(8, total_degree=2, total_num_hs=1),
    ]
    bonds = [FakeBond(0, 1), FakeBond(1, 2)]
    pos = np.array([[0.0, 0, 0], [1.5, 0, 0], [2.2, 1.1, 0]]) if with_pos else None
    return FakeMol(atoms, bonds, pos=pos)


def unsorted_conj_mol(with_pos=False):
    """C(CC=C)=C-like: TWO conjugated groups whose per-atom ids come out in
    non-monotonic atom order ([1, 0, 0, 1, ...]), reproducing the RDKit
    behavior that breaks naive sorted-incidence assumptions (ADVICE r1 #1).
    """
    n = 6
    atoms = [
        FakeAtom(6, total_degree=3, total_num_hs=1, hybridization="SP2")
        for _ in range(n)
    ]
    bonds = [
        FakeBond(0, 4, bond_type="DOUBLE", conjugated=True),
        FakeBond(0, 1),
        FakeBond(1, 2),
        FakeBond(2, 3, bond_type="DOUBLE", conjugated=True),
        FakeBond(4, 5),
    ]
    # atoms 0,4 in group 1; atoms 1... actually 2,3 in group 0 — ids descend
    # then ascend in atom order: [1, -1, 0, 0, 1, -1]
    conj = [1, -1, 0, 0, 1, 2**32 - 10]  # huge unsigned = non-conjugated
    pos = np.cumsum(np.ones((n, 3)), 0) if with_pos else None
    return FakeMol(atoms, bonds, conj_grp=conj, pos=pos)


def random_mol(rng, n_min=4, n_max=20, with_pos=True):
    """Random valid fake molecule: a bond path + random extra bonds + a
    random (possibly unsorted) conjugation assignment."""
    n = int(rng.integers(n_min, n_max + 1))
    kinds = ["SINGLE", "DOUBLE", "TRIPLE", "AROMATIC"]
    atoms = [
        FakeAtom(
            int(rng.choice([6, 6, 6, 7, 8, 9, 1])),
            total_degree=int(rng.integers(1, 5)),
            total_num_hs=int(rng.integers(0, 4)),
            hybridization=str(rng.choice(["SP", "SP2", "SP3"])),
            is_aromatic=bool(rng.random() < 0.3),
            in_ring=bool(rng.random() < 0.3),
        )
        for _ in range(n)
    ]
    bonds = [
        FakeBond(i, i + 1, bond_type=str(rng.choice(kinds))) for i in range(n - 1)
    ]
    for _ in range(int(rng.integers(0, n // 3 + 1))):
        i, j = rng.choice(n, size=2, replace=False)
        bonds.append(FakeBond(int(i), int(j), bond_type=str(rng.choice(kinds))))
    n_grp = int(rng.integers(0, 3))
    conj = [-1] * n
    if n_grp:
        for i in range(n):
            if rng.random() < 0.5:
                conj[i] = int(rng.integers(0, n_grp))
        # every group id < max must appear ≥ once for GetNumConjGrps parity
        present = sorted({g for g in conj if g >= 0})
        remap = {g: k for k, g in enumerate(present)}
        conj = [remap.get(g, -1) for g in conj]
    pos = rng.standard_normal((n, 3)) * 3.0 if with_pos else None
    return FakeMol(atoms, bonds, conj_grp=conj, pos=pos)
