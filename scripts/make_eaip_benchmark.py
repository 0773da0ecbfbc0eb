"""Reconstructed polymer EA/IP benchmark (Aldeghi & Coley, Chem. Sci.
2022, 13, 10486 — the wD-MPNN paper behind this fork).

The paper's dataset (coleygroup/polymer-chemprop-data: ~43k copolymers
from photocatalyst monomers, with xTB-computed electron affinity and
ionization potential) is NOT obtainable in this sandbox (no network — see
docs/parity.md). This script reconstructs the benchmark's STRUCTURE
exactly as the paper and reference describe it:

* monomer pool: real conjugated photocatalyst building blocks (the
  dibenzothiophene-sulfone chemistry of the README example plus standard
  donor/acceptor comonomers), each with two numbered wildcard attachment
  points;
* copolymer enumeration: monomer pairs x chain architecture
  {alternating, block, random} x stoichiometry {1:3, 1:1, 3:1} x degree
  of polymerization Xn — serialized in the reference's ensemble-string
  grammar (README.md:16-26): stoichiometry segment, '<i-j:w:w' stochastic
  bond list whose weights encode the architecture, '~Xn' suffix;
* labels: deterministic surrogate EA/IP from a group-contribution model
  with explicit composition, interface (architecture) and 1+log10(Xn)
  terms — the same THREE signal channels the wD-MPNN's weighted graph
  representation exists to capture. Labels are NOT the paper's xTB
  numbers; they are a stand-in that makes the paper's central claim
  measurable offline: a weighted ensemble graph must out-learn an
  architecture-blind one (tests/test_eaip_benchmark.py).

Usage: python scripts/make_eaip_benchmark.py out.csv [--per-arch-jitter]
"""

from __future__ import annotations

import csv
import hashlib
import itertools
import sys

# (name, ensemble SMILES with [*:1]/[*:2], electron_affinity_group_score,
#  ionization_group_score) — group scores are crude Hammett-flavoured
# electron-withdrawing/donating tallies, NOT xTB values.
MONOMERS = [
    ("DBTS", "[*:1]c1ccc2c(c1)S(=O)(=O)c1cc([*:2])ccc1-2", 1.9, 7.4),
    ("FLUOR", "[*:1]c1ccc2c(c1)C(C)(C)c1cc([*:2])ccc1-2", 0.9, 6.9),
    ("CARB", "[*:1]c1ccc2c(c1)[nH]c1cc([*:2])ccc12", 0.5, 6.2),
    ("PHEN", "[*:1]c1ccc([*:2])cc1", 1.0, 7.0),
    ("BTD", "[*:1]c1ccc2nsnc2c1[*:2]", 2.6, 7.8),
    ("THIO", "[*:1]c1ccc([*:2])s1", 1.2, 6.6),
    ("BIPY", "[*:1]c1ccc(-c2ccc([*:2])nc2)nc1", 2.0, 7.6),
    ("DBF", "[*:1]c1ccc2c(c1)oc1cc([*:2])ccc12", 1.1, 7.1),
    ("ANIL", "[*:1]c1ccc([*:2])c(N)c1", 0.4, 5.9),
]

ARCHITECTURES = ("alternating", "block", "random")
STOICHIOMETRIES = ((0.25, 0.75), (0.5, 0.5), (0.75, 0.25))
XNS = (5, 10, 50)


def bonds_for(arch: str, fa: float, fb: float):
    """Stochastic-bond weight table per architecture, in the reference's
    directed convention (README.md:20-24: '<i-j:w_ij:w_ji', w_ij = weight
    of the i->j edge, i.e. incoming to j). Every attachment point's
    incoming weights sum to 1. Monomer A carries tags 1,2; B tags 3,4."""
    if arch == "alternating":
        # A only bonds B: each end draws uniformly from the partner's ends
        return [("1-3", 0.5, 0.5), ("1-4", 0.5, 0.5),
                ("2-3", 0.5, 0.5), ("2-4", 0.5, 0.5)]
    if arch == "block":
        # long homo-blocks: strong self coupling, rare A-B interface
        return [("1-2", 0.85, 0.85), ("3-4", 0.85, 0.85),
                ("1-3", 0.075, 0.075), ("1-4", 0.075, 0.075),
                ("2-3", 0.075, 0.075), ("2-4", 0.075, 0.075)]
    # random: the next unit is A with probability fa, B with fb —
    # asymmetric directed weights (into an A-end: fa from A, fb/2 from
    # each B-end; into a B-end: fb from B, fa/2 from each A-end)
    return [("1-2", fa, fa), ("3-4", fb, fb),
            ("1-3", fa / 2, fb / 2), ("1-4", fa / 2, fb / 2),
            ("2-3", fa / 2, fb / 2), ("2-4", fa / 2, fb / 2)]


def ensemble_string(smi_a, smi_b, fa, fb, arch, xn):
    b = smi_b.replace("[*:1]", "[*:3]").replace("[*:2]", "[*:4]")
    rules = "".join(f"<{ij}:{wij:.6g}:{wji:.6g}"
                    for ij, wij, wji in bonds_for(arch, fa, fb)
                    if wij > 0 or wji > 0)
    return f"{smi_a}.{b}|{fa:.6g}|{fb:.6g}|{rules}~{xn}"


def _hash_unit(*key) -> float:
    h = hashlib.sha256(repr(key).encode()).digest()
    return int.from_bytes(h[:8], "big") / 2**64


def labels_for(name_a, ea_a, ip_a, name_b, ea_b, ip_b, fa, fb, arch, xn):
    """Surrogate EA/IP (eV): composition-weighted group scores + an
    interface term that depends on the ARCHITECTURE (donor-acceptor
    alternation stabilizes the LUMO / raises EA; blocks behave like the
    separate homopolymers) + a conjugation-length term in 1+log10(Xn) +
    a deterministic per-copolymer residual."""
    import math
    push_pull = 0.35 + abs(ea_a - ea_b) * 0.35
    interface = {"alternating": 1.0, "random": 2 * fa * fb,
                 "block": 0.15}[arch]
    conj = 1.0 + math.log10(xn)
    ea = (fa * ea_a + fb * ea_b) + push_pull * interface \
        + 0.18 * conj - 0.45
    ip = (fa * ip_a + fb * ip_b) - 0.5 * push_pull * interface \
        - 0.12 * conj + 0.35
    # deterministic residual (xTB-noise stand-in, ~0.05 eV RMS)
    ea += 0.06 * (_hash_unit("ea", name_a, name_b, fa, arch, xn) - 0.5)
    ip += 0.06 * (_hash_unit("ip", name_a, name_b, fa, arch, xn) - 0.5)
    return ea, ip


def generate(blind_weights: bool = False):
    rows = []
    for (na, sa, ea_a, ip_a), (nb, sb, ea_b, ip_b) in \
            itertools.combinations(MONOMERS, 2):
        for fa, fb in STOICHIOMETRIES:
            for arch in ARCHITECTURES:
                for xn in XNS:
                    s = ensemble_string(sa, sb, fa, fb, arch, xn)
                    if blind_weights:
                        # architecture-blind ablation: identical monomers/
                        # stoichiometry/Xn, uniform bond weights
                        s = ensemble_string(sa, sb, fa, fb, "alternating",
                                            xn)
                    ea, ip = labels_for(na, ea_a, ip_a, nb, ea_b, ip_b,
                                        fa, fb, arch, xn)
                    rows.append((s, ea, ip))
    return rows


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "eaip_benchmark.csv"
    blind = "--blind-weights" in sys.argv
    rows = generate(blind_weights=blind)
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["smiles", "EA", "IP"])
        for s, ea, ip in rows:
            w.writerow([s, f"{ea:.6f}", f"{ip:.6f}"])
    print(f"wrote {len(rows)} copolymers to {out}"
          + (" (architecture-blind weights)" if blind else ""))


if __name__ == "__main__":
    main()
