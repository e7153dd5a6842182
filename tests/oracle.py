"""Independent straight-line oracle implementation of the Polypolish
method, used to cross-check the vectorised/TPU pipeline end-to-end.

Deliberately simple: per-base dict pileups, sequential loops, no numpy.
It follows the published semantics (SURVEY.md §2/§3) directly and serves
as the executable spec for golden tests, since the Rust reference cannot
be built in this environment (no cargo).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

COMPLEMENT = {
    "A": "T", "T": "A", "G": "C", "C": "G", "a": "t", "t": "a", "g": "c",
    "c": "g", "N": "N", "n": "n", "R": "Y", "Y": "R", "S": "S", "W": "W",
    "K": "M", "M": "K", "B": "V", "V": "B", "D": "H", "H": "D", "r": "y",
    "y": "r", "s": "s", "w": "w", "k": "m", "m": "k", "b": "v", "v": "b",
    "d": "h", "h": "d", ".": ".", "-": "-", "?": "?",
}


def revcomp(seq: str) -> str:
    return "".join(COMPLEMENT.get(c, "N") for c in reversed(seq))


def bankers(x: float) -> int:
    down = int(x)
    frac = x - down
    if frac < 0.5:
        return down
    if frac > 0.5:
        return down + 1
    return down + (down & 1)


CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")


class OracleAln:
    def __init__(self, line: str):
        f = line.split("\t")
        self.name = f[0]
        self.flags = int(f[1])
        self.ref = f[2]
        self.pos = int(f[3]) - 1 if int(f[3]) > 0 else int(f[3])
        self.cigar = f[5]
        self.seq = f[9].upper()
        self.nm = None
        self.zp_fail = False
        for tag in f[11:]:
            if tag.startswith("NM:i:"):
                self.nm = int(tag[5:])
            if tag.lower() == "zp:z:fail":
                self.zp_fail = True

    @property
    def aligned(self) -> bool:
        return not (self.flags & 4)

    @property
    def forward(self) -> bool:
        return not (self.flags & 16)

    def expanded(self) -> str:
        if self.cigar == "*":
            return ""
        return "".join(int(n) * op for n, op in CIGAR_RE.findall(self.cigar))

    def ref_end(self) -> int:
        end = self.pos
        for n, op in CIGAR_RE.findall(self.cigar):
            if op in "MDN=X":
                end += int(n)
        return end

    def end_to_end(self) -> bool:
        e = self.expanded()
        return bool(e) and e[0] in "M=" and e[-1] in "M="


def ranges_with_trim(aln: OracleAln) -> List[Tuple[int, int]]:
    ranges: List[Tuple[int, int]] = []
    i = 0
    for op in aln.expanded():
        if op in "M=X":
            ranges.append((i, i + 1))
            i += 1
        elif op == "I":
            s, _ = ranges[-1]
            ranges[-1] = (s, i + 1)
            i += 1
        elif op == "D":
            ranges.append((i, i))
        else:
            raise AssertionError(f"unexpected op {op}")
    assert i == len(aln.seq)
    # homopolymer trim
    last = aln.seq[ranges[-1][0]:ranges[-1][1]]
    while ranges and aln.seq[ranges[-1][0]:ranges[-1][1]] == last:
        ranges.pop()
    if ranges:
        ranges.pop()
    return ranges


def oracle_polish(
    fasta: List[Tuple[str, str, str]],
    sam_texts: List[str],
    fraction_invalid: float = 0.2,
    fraction_valid: float = 0.5,
    max_errors: int = 10,
    min_depth: int = 5,
    careful: bool = False,
) -> Tuple[Dict[str, str], List[str]]:
    """Returns ({name: polished_seq}, debug_lines)."""
    pileups: Dict[str, List[Dict[str, int]]] = {}
    depths: Dict[str, List[float]] = {}
    for name, _, seq in fasta:
        pileups[name] = [dict() for _ in seq]
        depths[name] = [0.0 for _ in seq]

    for text in sam_texts:
        groups: List[List[OracleAln]] = []
        for line in text.splitlines():
            if not line or line.startswith("@"):
                continue
            a = OracleAln(line)
            if not a.aligned:
                continue
            if groups and groups[-1][0].name == a.name:
                groups[-1].append(a)
            else:
                groups.append([a])
        for group in groups:
            if careful and len(group) > 1:
                continue
            primary = next((a for a in group if a.seq != "*"), None)
            assert primary is not None
            good = [
                a for a in group
                if a.end_to_end() and a.nm <= max_errors and not a.zp_fail
            ]
            if not good:
                continue
            w = 1.0 / len(good)
            for a in good:
                if a.seq == "*":
                    a.seq = (
                        primary.seq
                        if a.forward == primary.forward
                        else revcomp(primary.seq)
                    )
                for offset, (s, e) in enumerate(ranges_with_trim(a)):
                    p = a.pos + offset
                    token = "-" if s == e else a.seq[s:e]
                    pileups[a.ref][p][token] = pileups[a.ref][p].get(token, 0) + 1
                    depths[a.ref][p] += w

    polished: Dict[str, str] = {}
    debug_lines: List[str] = []
    for name, _, seq in fasta:
        out_parts = []
        for p, orig in enumerate(seq):
            depth = depths[name][p]
            counts = pileups[name][p]
            valid_thr = max(min_depth, bankers(depth * fraction_valid))
            invalid_thr = bankers(depth * fraction_invalid)
            cand = dict(counts)
            for b in "ACGT":
                cand.setdefault(b, 0)
            valid = [s for s, c in cand.items() if c >= valid_thr]
            inter = [
                s for s, c in cand.items() if c < valid_thr and c >= invalid_thr
            ]
            new_base = orig
            status = "kept"
            if depth < min_depth:
                status = "low_depth"
            elif len(valid) == 1:
                if inter:
                    status = "too_close"
                else:
                    new_base = valid[0]
                    if new_base != orig:
                        status = "changed"
            elif len(valid) == 0:
                status = "none"
            else:
                status = "multiple"
            count_str = ",".join(
                sorted(f"{s}x{c}" for s, c in cand.items() if c > 0)
            )
            debug_lines.append(
                f"{name}\t{p}\t{orig}\t{depth:.1f}\t{invalid_thr}\t"
                f"{valid_thr}\t{count_str}\t{status}\t{new_base}"
            )
            out_parts.append(new_base)
        polished[name] = "".join(out_parts).replace("-", "")
    return polished, debug_lines


def oracle_filter(
    sam1_text: str,
    sam2_text: str,
    orientation: str = "auto",
    low_pct: float = 0.1,
    high_pct: float = 99.9,
) -> Tuple[List[bool], List[bool], int, int, str]:
    """Returns (verdicts_1, verdicts_2, low_thr, high_thr, orientation)
    with verdicts per aligned line in file order."""
    import math

    def load(text):
        by_name: Dict[str, List[OracleAln]] = {}
        order: List[OracleAln] = []
        for line in text.splitlines():
            if not line or line.startswith("@"):
                continue
            a = OracleAln(line)
            if not a.aligned:
                continue
            by_name.setdefault(a.name, []).append(a)
            order.append(a)
        return by_name, order

    by1, order1 = load(sam1_text)
    by2, order2 = load(sam2_text)

    def orient(a1: OracleAln, a2: OracleAln) -> str:
        s1 = "f" if a1.forward else "r"
        s2 = "f" if a2.forward else "r"
        p1 = a1.pos if a1.forward else a1.ref_end()
        p2 = a2.pos if a2.forward else a2.ref_end()
        if s1 != s2:
            return s1 + s2 if p1 < p2 else s2 + s1
        if s1 == "f":
            return "ff" if p1 < p2 else "rr"
        return "ff" if p2 < p1 else "rr"

    def insert(a1: OracleAln, a2: OracleAln) -> int:
        ps = [a1.pos, a1.ref_end(), a2.pos, a2.ref_end()]
        return max(ps) - min(ps)

    sizes: Dict[str, List[int]] = {}
    for name, alns1 in by1.items():
        if len(alns1) != 1:
            continue
        alns2 = by2.get(name)
        if not alns2 or len(alns2) != 1:
            continue
        if alns1[0].ref != alns2[0].ref:
            continue
        sizes.setdefault(orient(alns1[0], alns2[0]), []).append(
            insert(alns1[0], alns2[0])
        )
    if orientation == "auto":
        max_count = max((len(v) for v in sizes.values()), default=0)
        winners = [
            o for o in ("fr", "rf", "ff", "rr")
            if len(sizes.get(o, [])) == max_count
        ]
        assert len(winners) == 1
        orientation = winners[0]
    chosen = sorted(sizes.get(orientation, []))
    assert chosen

    def pct(vals, p):
        rank = max(math.ceil(p / 100.0 * len(vals)), 1)
        return vals[rank - 1]

    low_thr = pct(chosen, low_pct)
    high_thr = pct(chosen, high_pct)

    def verdicts(order, by_this, by_pair):
        out = []
        for a in order:
            this = by_this[a.name]
            pair = by_pair.get(a.name, [])
            if not pair or len(this) == 1:
                out.append(True)
                continue
            ok = False
            for p in pair:
                if (
                    a.ref == p.ref
                    and low_thr <= insert(a, p) <= high_thr
                    and orient(a, p) == orientation
                ):
                    ok = True
                    break
            out.append(ok)
        return out

    return (
        verdicts(order1, by1, by2),
        verdicts(order2, by2, by1),
        low_thr,
        high_thr,
        orientation,
    )
