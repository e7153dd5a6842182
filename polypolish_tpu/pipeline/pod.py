"""Host-sharded polish for one big genome (BASELINE config 4).

SURVEY §2 "Data parallelism (reads)": alignment batches streamed
shard-per-host.  Every process parses only its byte range of EVERY SAM
file (read-group snapped — identical boundary arithmetic on all
processes makes the ranges globally disjoint and complete, the same
complementarity proof as the in-process thread split, sam_packer.cc),
then the shards merge:

- dense counts: order-free integer sums (psum-shaped; here summed on
  the merging host),
- sparse tier: per-shard vocab ids remapped into the deterministically
  merged global vocab (shard order = file order), then summed,
- depth (order-sensitive f64): the 16-byte-per-alignment run HEADERS
  are gathered in reference order (file-major, shard ranges ascending
  within each file) and replayed by pp_depth_fold — bit-identical to a
  single-host run at ~1/40th the SAM's data volume,

so the polished FASTA and --debug TSV are byte-identical to the
single-host pipeline (asserted in tests/test_pod.py).

On a real multi-host pod each process runs parse_runs(proc_idx =
jax.process_index(), n_procs = jax.process_count()) and the merge
arrays travel over jax.experimental.multihost_utils.process_allgather;
this module keeps the merge logic communication-agnostic (`shards` is
just a list of per-process results) because only single-host hardware
is reachable here — the in-process simulation exercises the identical
code path.
"""

from __future__ import annotations

import sys
import time
from typing import Dict, List, Optional, TextIO, Tuple

import numpy as np

from polypolish_tpu import log
from polypolish_tpu.errors import quit_with_error
from polypolish_tpu.io.fasta import load_fasta
from polypolish_tpu.ops.consensus import (
    compute_thresholds,
    consensus_dense_numpy,
)
from polypolish_tpu.pipeline.polish import (
    _create_debug_file,
    _orig_ids_for_seq,
    _report_alignment_stats,
    check_inputs_exist,
    check_option_values,
    finish_sequence,
    finished_message,
    starting_message,
)
from polypolish_tpu.vocab import DENSE_V, Vocab


def polish_pod(
    debug: Optional[str],
    fraction_invalid: float,
    fraction_valid: float,
    max_errors: int,
    min_depth: int,
    careful: bool,
    assembly: str,
    sam: List[str],
    n_procs: int,
    out: Optional[TextIO] = None,
    n_threads: Optional[int] = None,
) -> List[Tuple[str, int]]:
    """Polish with the SAM ingest sharded over ``n_procs`` byte-range
    shards (simulated in-process; see module docstring for real pods).
    Byte-identical to single-host polish()."""
    start_time = time.monotonic()
    if out is None:
        out = sys.stdout
    check_option_values(fraction_invalid, fraction_valid)
    check_inputs_exist(assembly, sam)
    starting_message(
        debug, fraction_invalid, fraction_valid, max_errors, min_depth,
        careful, assembly, sam,
    )

    log.section_header("Loading assembly")
    fasta = load_fasta(assembly)
    seq_names = []
    for name, description, sequence in fasta:
        log.eprint(f"{name} ({log.thousands(len(sequence))} bp)")
        seq_names.append((name, description))
    log.eprint()
    contig_names = [n for n, _, _ in fasta]
    contig_lens = {n: len(s) for n, _, s in fasta}
    contig_seq = {n: s for n, _, s in fasta}

    log.section_header("Loading alignments")
    shards, shard_vocabs = parse_pod_shards(
        sam, contig_names, contig_lens, max_errors, careful, n_procs,
        n_threads,
    )
    vocab, remaps = merge_vocabs(shard_vocabs)

    # merged per-file stats; the whole-file zero-alignment fatal was
    # deferred by the shard parses (a RANGE may be empty)
    stats_list = []
    for f, s_path in enumerate(sam):
        a = sum(sh.file_stats[f][0] for sh in shards)
        u = sum(sh.file_stats[f][1] for sh in shards)
        r = sum(sh.file_stats[f][2] for sh in shards)
        if a == 0:
            quit_with_error(f'no alignments in "{s_path}"')
        stats_list.append((a, u, r))
    _report_alignment_stats(sam, stats_list, careful)
    log.eprint(
        f"Pod mode: SAM ingest sharded over {n_procs} byte-range shards"
    )
    log.eprint()

    headers = gather_headers(shards, len(sam))

    log.section_header("Polishing assembly sequences")
    log.explanation(
        "For each position in the assembly, Polypolish determines the read "
        "depth at that position and collects all aligned bases. It then "
        "polishes the assembly by looking for positions where the pileup "
        "unambiguously supports a different sequence than the assembly."
    )
    debug_file = _create_debug_file(debug)
    new_lengths = []
    try:
        for name, description in seq_names:
            seq = contig_seq[name]
            log.eprint(f"Polishing {name} ({log.thousands(len(seq))} bp):")
            counts, depth, sparse = merge_contig(
                shards, remaps, headers, name, contig_names,
                contig_lens[name],
            )
            valid_thr, invalid_thr, low_depth = compute_thresholds(
                depth, min_depth, fraction_valid, fraction_invalid
            )
            orig_id = _orig_ids_for_seq(seq, vocab)
            new_id, status = consensus_dense_numpy(
                counts, valid_thr, invalid_thr, low_depth, orig_id
            )
            new_length = finish_sequence(
                name, description, seq, counts, depth, sparse,
                valid_thr, invalid_thr, new_id, status, orig_id,
                min_depth, vocab, out, debug_file,
            )
            new_lengths.append((name, new_length))
    finally:
        if debug_file is not None:
            debug_file.close()
        for sh in shards:
            sh.close()
    finished_message(debug, new_lengths, start_time)
    return new_lengths


def parse_pod_shards(sam, contig_names, contig_lens, max_errors, careful,
                     n_procs, n_threads=None):
    """One ParsedRuns per simulated process, each with its own Vocab
    (real pods: each process runs exactly one of these)."""
    from polypolish_tpu.native import runs as native_runs

    shards = []
    vocabs = []
    for i in range(n_procs):
        v = Vocab()
        shards.append(native_runs.parse_runs(
            [str(s) for s in sam], contig_names, contig_lens, v,
            max_errors, careful, n_threads, proc_idx=i, n_procs=n_procs,
        ))
        vocabs.append(v)
    return shards, vocabs


def merge_vocabs(shard_vocabs: List[Vocab]):
    """Deterministic global vocab: first occurrence in shard order
    (= file order, since shard ranges ascend within each file).
    Returns (global vocab, per-shard id remap arrays)."""
    vocab = Vocab()
    base = len(Vocab().strings)
    remaps = []
    for v in shard_vocabs:
        remap = np.asarray(
            [vocab.intern(s) for s in v.strings[base:]], dtype=np.int64
        )
        remaps.append(remap)
    return vocab, remaps


def gather_headers(shards, n_files: int):
    """Run headers concatenated in REFERENCE order: file-major, shard
    ranges ascending within each file (this is the allgather payload on
    a real pod: 16 bytes per alignment)."""
    per_shard = []
    for sh in shards:
        rc, rs, rl, rk, _vb, _oi, _ov, _poff = sh.raw()
        bounds = np.concatenate(([0], np.cumsum(sh.file_runs)))
        per_shard.append((rc, rs, rl, rk, bounds))
    cols = [[], [], [], []]
    for f in range(n_files):
        for rc, rs, rl, rk, bounds in per_shard:
            lo, hi = int(bounds[f]), int(bounds[f + 1])
            for c, arr in zip(cols, (rc, rs, rl, rk)):
                c.append(arr[lo:hi])
    return tuple(
        np.ascontiguousarray(np.concatenate(c), dtype=np.int32)
        for c in cols
    )


def merge_contig(shards, remaps, headers, name, contig_names, P):
    """Merged (counts, depth, sparse) for one contig: integer sums over
    shard folds + the exact header-replay depth."""
    import ctypes

    from polypolish_tpu.native import binding

    counts = np.zeros((DENSE_V, P), dtype=np.int32)
    sparse_acc: Dict[int, int] = {}
    base = DENSE_V
    for sh, remap in zip(shards, remaps):
        c, _d, (sp, sv, sc) = sh.fold(name)
        counts += c
        if sp.size:
            sv = sv.astype(np.int64)
            high = sv >= sh.base_vocab_len
            if high.any():
                sv = sv.copy()
                sv[high] = remap[sv[high] - sh.base_vocab_len]
            for p, v, cnt in zip(sp.tolist(), sv.tolist(), sc.tolist()):
                key = p * (2**31) + v
                sparse_acc[key] = sparse_acc.get(key, 0) + cnt
    if sparse_acc:
        keys = np.asarray(sorted(sparse_acc), dtype=np.int64)
        sparse = (
            keys // (2**31), keys % (2**31),
            np.asarray([sparse_acc[int(k)] for k in keys], dtype=np.int64),
        )
    else:
        e = np.empty(0, dtype=np.int64)
        sparse = (e, e, e)

    rc, rs, rl, rk = headers
    lib = binding.load_library()
    depth = np.empty(P, dtype=np.float64)
    cid = contig_names.index(name)
    lib.pp_depth_fold(
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rc.shape[0], cid, P,
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return counts, depth, sparse
