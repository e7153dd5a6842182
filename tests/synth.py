"""Synthetic FASTA/SAM generators for end-to-end tests and benches."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

BASES = "ACGT"


def rand_seq(rng, n: int) -> str:
    return "".join(BASES[i] for i in rng.integers(0, 4, size=n))


def revcomp(seq: str) -> str:
    comp = {"A": "T", "T": "A", "G": "C", "C": "G"}
    return "".join(comp.get(c, "N") for c in reversed(seq))


def hamming(a: str, b: str) -> int:
    return sum(1 for x, y in zip(a, b) if x != y)


def _read_with_edits(rng, draft: str, pos: int, length: int, err: float):
    """Build a read + CIGAR by walking the draft with random edits.

    Returns (seq, cigar, nm, ref_consumed).  First and last ops are
    always matches so the alignment is end-to-end.
    """
    ops: List[str] = []
    seq_parts: List[str] = []
    nm = 0
    ref_i = pos
    t = 0
    while t < length and ref_i < len(draft):
        first_or_last = t == 0 or t == length - 1
        r = rng.random()
        if not first_or_last and r < err / 3:
            # insertion of one random base (counts toward NM)
            seq_parts.append(BASES[rng.integers(0, 4)])
            ops.append("I")
            nm += 1
            t += 1
            continue
        if not first_or_last and r < 2 * err / 3:
            # deletion of one draft base
            ops.append("D")
            nm += 1
            ref_i += 1
            continue
        if r < err:
            # substitution
            orig = draft[ref_i]
            choices = [b for b in BASES if b != orig]
            seq_parts.append(choices[rng.integers(0, 3)])
            nm += 1
        else:
            seq_parts.append(draft[ref_i])
        ops.append("M")
        ref_i += 1
        t += 1
    # compress ops to CIGAR
    cigar_parts = []
    prev = ops[0]
    count = 1
    for op in ops[1:]:
        if op == prev:
            count += 1
        else:
            cigar_parts.append(f"{count}{prev}")
            prev, count = op, 1
    cigar_parts.append(f"{count}{prev}")
    return "".join(seq_parts), "".join(cigar_parts), nm, ref_i - pos


def make_polish_case(
    seed: int = 0,
    genome_len: int = 600,
    n_reads: int = 400,
    read_len: int = 40,
    n_draft_errors: int = 6,
    err: float = 0.08,
    multi_frac: float = 0.25,
    contig_name: str = "contig_1",
    shuffle_groups: bool = False,
) -> Tuple[List[Tuple[str, str, str]], str]:
    """Returns (fasta_records, sam_text).

    The draft differs from the 'true' genome at a few substitution sites,
    so polishing should change those positions back.  Reads sample the
    true genome with random errors (subs/ins/dels in their CIGARs); some
    reads are multi-mapped with secondary '*'-seq lines on either strand.
    """
    rng = np.random.default_rng(seed)
    true_genome = rand_seq(rng, genome_len)
    draft = list(true_genome)
    err_sites = rng.choice(genome_len, size=n_draft_errors, replace=False)
    for site in err_sites:
        cur = draft[site]
        draft[site] = [b for b in BASES if b != cur][rng.integers(0, 3)]
    draft = "".join(draft)

    lines = [
        "@HD\tVN:1.6\tSO:unsorted",
        f"@SQ\tSN:{contig_name}\tLN:{genome_len}",
    ]
    for i in range(n_reads):
        name = f"read_{i:05d}"
        pos = int(rng.integers(0, genome_len - read_len))
        seq, cigar, _, _ = _read_with_edits(rng, true_genome, pos, read_len, err)
        # NM is relative to the draft (where the read is aligned)
        flags = 0 if rng.random() < 0.5 else 16
        nm = _nm_vs_draft(seq, cigar, draft, pos)
        group = [
            f"{name}\t{flags}\t{contig_name}\t{pos + 1}\t60\t{cigar}\t*\t0\t0"
            f"\t{seq}\t{'K' * len(seq)}\tNM:i:{nm}"
        ]
        if rng.random() < multi_frac:
            n_secondary = int(rng.integers(1, 3))
            for _ in range(n_secondary):
                pos2 = int(rng.integers(0, genome_len - len(seq)))
                flags2 = (256 | (0 if rng.random() < 0.5 else 16))
                seq2 = seq if (flags2 & 16) == (flags & 16) else revcomp(seq)
                cigar2 = f"{len(seq)}M"
                nm2 = hamming(seq2, draft[pos2:pos2 + len(seq)])
                star = "*" if rng.random() < 0.7 else seq2
                group.append(
                    f"{name}\t{flags2}\t{contig_name}\t{pos2 + 1}\t0\t{cigar2}"
                    f"\t*\t0\t0\t{star}\t*\tNM:i:{nm2}"
                )
        if rng.random() < 0.05:
            group[-1] += "\tZP:Z:fail"
        if shuffle_groups and len(group) > 1:
            # a primary need not be the first line of its group — the
            # read seq is recovered from the first non-'*' alignment
            rng.shuffle(group)
        lines.extend(group)
        if rng.random() < 0.03:
            lines.append(
                f"unmapped_{i}\t4\t*\t0\t0\t*\t*\t0\t0\t{rand_seq(rng, 20)}\t*"
            )
    sam_text = "\n".join(lines) + "\n"
    fasta = [(contig_name, "synthetic draft", draft)]
    return fasta, sam_text


def _nm_vs_draft(seq: str, cigar: str, draft: str, pos: int) -> int:
    """Edit count (mismatches + indel bases) of the aligned read vs the
    draft, the way an aligner would fill NM."""
    import re

    nm = 0
    i = 0
    ref_i = pos
    for n, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar):
        n = int(n)
        if op in "M=X":
            nm += hamming(seq[i:i + n], draft[ref_i:ref_i + n])
            i += n
            ref_i += n
        elif op == "I":
            nm += n
            i += n
        elif op == "D":
            nm += n
            ref_i += n
    return nm


def make_multi_contig_case(
    seed: int = 0, n_contigs: int = 3, **kwargs
) -> Tuple[List[Tuple[str, str, str]], str]:
    """Multi-contig assembly + one SAM mixing reads from every contig
    (read groups stay consecutive; group order interleaves contigs)."""
    rng = np.random.default_rng(seed + 999)
    fastas = []
    groups: List[List[str]] = []
    for c in range(n_contigs):
        fasta, sam_text = make_polish_case(
            seed=seed + c, contig_name=f"ctg_{c}", **kwargs
        )
        fastas.extend(fasta)
        header_done = False
        cur: List[str] = []
        cur_name = None
        for line in sam_text.splitlines():
            if line.startswith("@"):
                continue
            name = line.split("\t", 1)[0]
            renamed = f"c{c}_{name}"
            line = renamed + line[len(name):]
            if cur_name != renamed:
                if cur:
                    groups.append(cur)
                cur = []
                cur_name = renamed
            cur.append(line)
        if cur:
            groups.append(cur)
    order = rng.permutation(len(groups))
    lines = ["@HD\tVN:1.6"]
    for c in range(n_contigs):
        lines.append(f"@SQ\tSN:ctg_{c}\tLN:{len(fastas[c][2])}")
    for gi in order:
        lines.extend(groups[gi])
    return fastas, "\n".join(lines) + "\n"


def fasta_text(records: List[Tuple[str, str, str]]) -> str:
    out = []
    for name, desc, seq in records:
        header = f">{name} {desc}" if desc else f">{name}"
        out.append(header)
        out.append(seq)
    return "\n".join(out) + "\n"


def make_filter_case(
    seed: int = 0,
    genome_len: int = 5000,
    n_pairs: int = 300,
    read_len: int = 50,
    insert_mean: int = 300,
    multi_frac: float = 0.3,
    contig_names: Tuple[str, ...] = ("c1", "c2"),
) -> Tuple[str, str]:
    """Paired-end SAM files (fr orientation dominant) for filter tests."""
    rng = np.random.default_rng(seed)
    genomes = {c: rand_seq(rng, genome_len) for c in contig_names}

    def aln_line(name, flags, contig, pos, seq):
        return (
            f"{name}\t{flags}\t{contig}\t{pos + 1}\t60\t{len(seq)}M\t*\t0\t0"
            f"\t{seq}\t{'K' * len(seq)}\tNM:i:0"
        )

    lines1 = ["@HD\tVN:1.6"]
    lines2 = ["@HD\tVN:1.6"]
    for c in contig_names:
        lines1.append(f"@SQ\tSN:{c}\tLN:{genome_len}")
        lines2.append(f"@SQ\tSN:{c}\tLN:{genome_len}")

    for i in range(n_pairs):
        name = f"pair_{i:05d}"
        contig = contig_names[int(rng.integers(0, len(contig_names)))]
        g = genomes[contig]
        insert = int(max(2 * read_len + 10, rng.normal(insert_mean, 30)))
        start = int(rng.integers(0, genome_len - insert))
        # fr pair: read1 forward at start, read2 reverse at the far end
        p1, p2 = start, start + insert - read_len
        if rng.random() < 0.5:
            p1, p2 = p2, p1
            f1, f2 = 16, 0
        else:
            f1, f2 = 0, 16
        lines1.append(aln_line(name, f1, contig, p1, g[p1:p1 + read_len]))
        lines2.append(aln_line(name, f2, contig, p2, g[p2:p2 + read_len]))
        if rng.random() < multi_frac:
            # extra (likely discordant) alignments for read 1 and/or 2
            for target, flist in ((lines1, f1), (lines2, f2)):
                for _ in range(int(rng.integers(0, 3))):
                    c2 = contig_names[int(rng.integers(0, len(contig_names)))]
                    pos2 = int(rng.integers(0, genome_len - read_len))
                    fl = 256 | (0 if rng.random() < 0.5 else 16)
                    target.append(
                        aln_line(name, fl, c2, pos2,
                                 genomes[c2][pos2:pos2 + read_len])
                    )
        if rng.random() < 0.04:
            lines1.append(
                f"solo_{i}\t4\t*\t0\t0\t*\t*\t0\t0\t{rand_seq(rng, read_len)}\t*"
            )
        if rng.random() < 0.06:
            # orphan: aligned (even multi-mapped) in file 1 only — the
            # "no pair alignments -> pass" rule (filter.rs:362-364)
            name_o = f"orph_{i:05d}"
            for _ in range(int(rng.integers(1, 4))):
                c2 = contig_names[int(rng.integers(0, len(contig_names)))]
                pos_o = int(rng.integers(0, genome_len - read_len))
                fl = 0 if rng.random() < 0.5 else 16
                lines1.append(
                    aln_line(name_o, fl, c2, pos_o,
                             genomes[c2][pos_o:pos_o + read_len])
                )
            # its mate exists in file 2 but is unaligned
            lines2.append(
                f"{name_o}\t4\t*\t0\t0\t*\t*\t0\t0\t{rand_seq(rng, read_len)}\t*"
            )
    return "\n".join(lines1) + "\n", "\n".join(lines2) + "\n"
