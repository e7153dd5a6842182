"""Fast vectorized benchmark-workload generator.

Produces BASELINE.json-shaped polish inputs at Mb scale in seconds
(tests/synth.py is per-read Python — fine for unit tests, ~50 s/Mb for
benchmarks):

- config 2 shape: E. coli-scale draft + paired-end reads, two SAM files
  (R1/R2 aligned separately, as Polypolish's bwa-mem workflow produces)
- config 3 shape: repeat-rich genome; reads starting inside a repeat
  copy carry secondary '*'-seq alignments at every homologous locus
  (the `bwa mem -a` all-locations shape, README.md:3 / polish.rs:45-49)

All sequence/NM work is numpy-vectorized; only the final line join is
Python.  Deterministic per seed.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_COMP = np.zeros(256, dtype=np.uint8)
for a, b in zip(b"ACGTN", b"TGCAN"):
    _COMP[a] = b


def _rand_genome(rng, length: int) -> np.ndarray:
    return _BASES[rng.integers(0, 4, size=length)]


def _plant_repeats(rng, genome: np.ndarray, repeat_len: int,
                   n_copies: int) -> List[int]:
    """Paste n_copies of one segment at non-overlapping loci; returns
    the copy start offsets (first = the source)."""
    g = len(genome)
    src = int(rng.integers(0, g - repeat_len))
    starts = [src]
    tries = 0
    while len(starts) < n_copies and tries < 1000:
        tries += 1
        cand = int(rng.integers(0, g - repeat_len))
        if all(abs(cand - s) >= repeat_len for s in starts):
            genome[cand:cand + repeat_len] = genome[src:src + repeat_len]
            starts.append(cand)
    return sorted(starts)


def _windows(genome: np.ndarray, starts: np.ndarray, L: int) -> np.ndarray:
    """(n, L) uint8 view-gather of genome windows."""
    return genome[starts[:, None] + np.arange(L)[None, :]]


def _apply_errors(rng, reads: np.ndarray, err_rate: float) -> None:
    """In-place random substitutions at ~err_rate per base."""
    n, L = reads.shape
    n_err = rng.binomial(n * L, err_rate)
    if n_err == 0:
        return
    rows = rng.integers(0, n, size=n_err)
    cols = rng.integers(0, L, size=n_err)
    subs = _BASES[rng.integers(0, 4, size=n_err)]
    reads[rows, cols] = subs


def _revcomp_rows(reads: np.ndarray) -> np.ndarray:
    return _COMP[reads[:, ::-1]]


def _to_strs(reads: np.ndarray) -> List[str]:
    L = reads.shape[1]
    flat = np.ascontiguousarray(reads).view(f"S{L}").ravel()
    return [s.decode("ascii") for s in flat]


def make_paired_case(
    seed: int = 0,
    genome_len: int = 4_600_000,
    coverage: float = 50.0,
    read_len: int = 150,
    insert_mean: int = 400,
    insert_sd: int = 40,
    err_rate: float = 0.002,
    draft_err_per_kb: float = 0.05,
    repeat_len: int = 0,
    repeat_copies: int = 0,
    contig_name: str = "contig_1",
    read_prefix: str = "r",
) -> Tuple[str, List[str], dict]:
    """Returns (fasta_text, [sam1_text, sam2_text], info).

    Reads sample the true genome; the draft carries substitution errors
    for polish to fix.  When repeat_len/repeat_copies are set, reads
    whose start falls inside a repeat copy get '*'-seq secondary
    alignments at every homologous position (all-locations shape).
    """
    rng = np.random.default_rng(seed)
    true_genome = _rand_genome(rng, genome_len)
    repeat_starts: List[int] = []
    if repeat_len and repeat_copies > 1:
        repeat_starts = _plant_repeats(rng, true_genome, repeat_len,
                                       repeat_copies)

    draft = true_genome.copy()
    n_draft_err = max(1, int(genome_len * draft_err_per_kb / 1000))
    err_sites = rng.choice(genome_len, size=n_draft_err, replace=False)
    draft[err_sites] = _BASES[(
        np.searchsorted(_BASES, draft[err_sites]) + rng.integers(
            1, 4, size=n_draft_err)) % 4]

    n_pairs = int(genome_len * coverage / (2 * read_len))
    L = read_len
    inserts = np.clip(
        rng.normal(insert_mean, insert_sd, size=n_pairs).astype(np.int64),
        2 * L, None,
    )
    p_left = rng.integers(0, genome_len - inserts - 1, size=n_pairs)
    p_right = p_left + inserts - L
    # consistent fr orientation: the forward mate sits at the left
    # position, the reverse mate at the right; `flip` chooses whether
    # R1 or R2 is the forward mate
    flip = rng.random(n_pairs) < 0.5
    pos1 = np.where(flip, p_right, p_left)
    pos2 = np.where(flip, p_left, p_right)
    flags1 = np.where(flip, 1 + 64 + 16, 1 + 64 + 32).astype(np.int64)
    flags2 = np.where(flip, 1 + 128 + 32, 1 + 128 + 16).astype(np.int64)

    # SAM SEQ is stored as aligned to the forward reference strand, so
    # both mates' seqs are forward-strand windows; flag bit 16 records
    # that the physical read was the reverse complement.
    r1 = _windows(true_genome, pos1, L).copy()
    r2 = _windows(true_genome, pos2, L).copy()
    _apply_errors(rng, r1, err_rate)
    _apply_errors(rng, r2, err_rate)

    nm1 = (r1 != _windows(draft, pos1, L)).sum(axis=1)
    nm2 = (r2 != _windows(draft, pos2, L)).sum(axis=1)

    # secondary homolog positions for reads starting inside a repeat copy
    sec1 = _secondary_map(pos1, repeat_starts, repeat_len, L, genome_len)
    sec2 = _secondary_map(pos2, repeat_starts, repeat_len, L, genome_len)

    s1 = _to_strs(r1)
    s2 = _to_strs(r2)

    header = (
        "@HD\tVN:1.6\tSO:unsorted\n"
        f"@SQ\tSN:{contig_name}\tLN:{genome_len}\n"
    )
    sams = []
    for seqs, starts, flags, nms, secs in (
        (s1, pos1, flags1, nm1, sec1),
        (s2, pos2, flags2, nm2, sec2),
    ):
        lines = [header]
        cigar = f"{L}M"
        starts_l = (starts + 1).tolist()
        flags_l = flags.tolist()
        nms_l = nms.tolist()
        qual = "I" * L
        for i in range(n_pairs):
            name = f"{read_prefix}{i:07d}"
            lines.append(
                f"{name}\t{flags_l[i]}\t{contig_name}\t{starts_l[i]}\t60\t"
                f"{cigar}\t*\t0\t0\t{seqs[i]}\t{qual}\tNM:i:{nms_l[i]}\n"
            )
            if i in secs:
                f2 = flags_l[i] | 256
                for sp, snm in secs[i]:
                    lines.append(
                        f"{name}\t{f2}\t{contig_name}\t{sp + 1}\t0\t{cigar}"
                        f"\t*\t0\t0\t*\t*\tNM:i:{snm}\n"
                    )
        sams.append("".join(lines))

    fasta_text = f">{contig_name} benchmark draft\n" + \
        draft.tobytes().decode("ascii") + "\n"
    n_secondary = sum(len(v) for v in sec1.values()) + \
        sum(len(v) for v in sec2.values())
    info = {
        "n_pairs": n_pairs,
        "n_alignments": 2 * n_pairs + n_secondary,
        "n_secondary": n_secondary,
        "genome_len": genome_len,
        "read_len": read_len,
        "repeat_starts": repeat_starts,
    }
    return fasta_text, sams, info


def _secondary_map(starts: np.ndarray, repeat_starts: List[int],
                   repeat_len: int, L: int, genome_len: int) -> dict:
    """read index -> [(secondary_pos, nm), ...] for reads fully inside a
    repeat copy.  NM of a secondary is unknown to us without re-aligning;
    bwa would report the true mismatch count — we emit 0 (identical
    copies), which keeps them under --max_errors like bwa's output."""
    out: dict = {}
    if not repeat_starts or repeat_len <= L:
        return out
    rs = np.asarray(repeat_starts, dtype=np.int64)
    # reads fully inside copy j: rs[j] <= start <= rs[j]+repeat_len-L
    for j, s0 in enumerate(repeat_starts):
        inside = np.nonzero(
            (starts >= s0) & (starts <= s0 + repeat_len - L)
        )[0]
        for i in inside.tolist():
            off = int(starts[i]) - s0
            alts = [int(r) + off for k, r in enumerate(rs) if k != j]
            alts = [a for a in alts if a + L <= genome_len]
            if alts:
                out[i] = [(a, 0) for a in alts]
    return out


def write_case(out_dir: str, name: str, fasta_text: str,
               sams: List[str]) -> Tuple[str, List[str]]:
    os.makedirs(out_dir, exist_ok=True)
    asm = os.path.join(out_dir, f"{name}.fasta")
    with open(asm, "w") as f:
        f.write(fasta_text)
    paths = []
    for i, s in enumerate(sams, 1):
        p = os.path.join(out_dir, f"{name}_{i}.sam")
        with open(p, "w") as f:
            f.write(s)
        paths.append(p)
    return asm, paths


if __name__ == "__main__":
    import argparse
    import sys
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/polypolish_tpu_bench")
    ap.add_argument("--name", default="paired")
    ap.add_argument("--genome-mb", type=float, default=4.6)
    ap.add_argument("--coverage", type=float, default=50)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--repeat-len", type=int, default=0)
    ap.add_argument("--repeat-copies", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    t0 = time.time()
    fasta, sams, info = make_paired_case(
        seed=a.seed, genome_len=int(a.genome_mb * 1e6), coverage=a.coverage,
        read_len=a.read_len, repeat_len=a.repeat_len,
        repeat_copies=a.repeat_copies,
    )
    asm, paths = write_case(a.out, a.name, fasta, sams)
    print(f"generated {info['n_alignments']:,} alignments "
          f"({info['n_secondary']:,} secondary) in {time.time()-t0:.1f}s",
          file=sys.stderr)
    print(asm, *paths)


def make_multi_contig_case(
    seed: int = 0,
    n_contigs: int = 10,
    contig_len: int = 10_000_000,
    coverage: float = 10.0,
    read_len: int = 150,
    repeat_len: int = 0,
    repeat_copies: int = 0,
) -> Tuple[str, List[str], dict]:
    """Multi-contig draft (SURVEY config-4 shape: "multi-contig 100 Mb
    draft"): n_contigs independent contigs concatenated into one FASTA
    + two SAM files.  Read names carry a per-contig prefix so group
    boundaries stay exact, and each sub-case's header @SQ lines are
    merged up front (SAM wants all header lines before any body)."""
    fastas, bodies1, bodies2, sqs = [], [], [], []
    total = {"n_pairs": 0, "n_alignments": 0, "n_secondary": 0}
    for k in range(n_contigs):
        name = f"contig_{k + 1}"
        fa, sams, info = make_paired_case(
            seed=seed * 1000 + k, genome_len=contig_len,
            coverage=coverage, read_len=read_len,
            repeat_len=repeat_len, repeat_copies=repeat_copies,
            contig_name=name, read_prefix=f"c{k}r",
        )
        fastas.append(fa)
        sqs.append(f"@SQ\tSN:{name}\tLN:{contig_len}\n")
        for b, s in zip((bodies1, bodies2), sams):
            # strip the sub-case's 2 header lines
            b.append(s.split("\n", 2)[2])
        for key in total:
            total[key] += info[key]
    header = "@HD\tVN:1.6\tSO:unsorted\n" + "".join(sqs)
    total["genome_len"] = n_contigs * contig_len
    total["read_len"] = read_len
    return ("".join(fastas),
            [header + "".join(bodies1), header + "".join(bodies2)],
            total)
