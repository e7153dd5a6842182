"""Truly multi-process pod polish: one JAX process per SAM ingest shard.

This is the executed form of the pod design in pipeline/pod.py (config 4,
SURVEY §2 "Data parallelism (reads)"): after ``jax.distributed.initialize``
each process parses only its read-group-snapped byte range of EVERY SAM
file (alignment.rs:214-272 semantics, sharded), then the shards merge over
the wire:

- dense per-contig counts: a real ``jax.lax.psum`` over the global
  ('data',) device mesh (ICI within a slice, DCN across hosts),
- run HEADERS (16 bytes/alignment) + sparse-tier triples + new vocab
  strings + per-file stats: ``multihost_utils.process_allgather``
  (variable-length payloads travel padded-to-max with a length prefix),
- depth (order-sensitive f64, polish.rs:177): every process replays the
  gathered headers in reference order through ``pp_depth_fold`` — a
  deterministic recomputation, bit-identical to single-host.

Every process computes the identical consensus; process 0 writes the
FASTA/TSV.  Output is asserted byte-identical to single-process
``polish()`` in tests/test_pod_distributed.py, which launches real
multi-process CPU jobs over a localhost coordinator (the same code path
a TPU pod runs over DCN).
"""

from __future__ import annotations

import sys
import time
from typing import List, Optional, TextIO, Tuple

import numpy as np

from polypolish_tpu import log
from polypolish_tpu.errors import quit_with_error
from polypolish_tpu.io.fasta import load_fasta
from polypolish_tpu.ops.consensus import (
    compute_thresholds,
    consensus_dense_numpy,
)
from polypolish_tpu.pipeline.pod import merge_vocabs
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


# ---------------------------------------------------------------------
# collective helpers
# ---------------------------------------------------------------------

_MODEL_CACHE: dict = {}


def _device_votes() -> bool:
    """Pod device-vote mode: each process counts its shard's votes on
    its own accelerator with the lanes kernel instead of the host fold
    (POLYPOLISH_TPU_POD_DEVICE_VOTES=1; the natural setting on a real
    TPU pod where every process owns local chips)."""
    import os

    return os.environ.get("POLYPOLISH_TPU_POD_DEVICE_VOTES", "0") == "1"


def _allgather_var(arr: np.ndarray) -> List[np.ndarray]:
    """All-gather a 1-D array whose length differs per process.

    Returns the per-process arrays in process order (identical result on
    every process).  Payloads travel padded to the max length; lengths
    travel first as a fixed-shape allgather.
    """
    from jax.experimental import multihost_utils

    # Payloads travel as raw bytes: JAX default-disables x64, so an
    # int64 array would be silently truncated to int32 on the wire.
    dtype = arr.dtype
    raw = np.ascontiguousarray(arr).view(np.uint8)
    n = np.asarray([raw.shape[0]], dtype=np.int64).view(np.uint8)
    lens = (
        np.asarray(multihost_utils.process_allgather(n))
        .reshape(-1, 8).copy().view(np.int64).reshape(-1)
    )
    m = max(1, int(lens.max()))
    pad = np.zeros((m,), dtype=np.uint8)
    pad[: raw.shape[0]] = raw
    g = np.asarray(multihost_utils.process_allgather(pad))
    return [
        g[i, : int(lens[i])].copy().view(dtype)
        for i in range(lens.shape[0])
    ]


def _psum_i32(arr: np.ndarray) -> np.ndarray:
    """Elementwise sum of an identical-shaped int32 array across
    processes via a real ``jax.lax.psum`` over the global ('data',)
    device mesh — the TPU-native count merge (exact: integer)."""
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec

    from polypolish_tpu.parallel.shard import shard_map

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    local_n = jax.local_device_count()
    # this process's payload rides local device 0; other local devices
    # contribute zeros so the psum result is the per-process sum
    local = np.zeros((local_n,) + arr.shape, dtype=np.int32)
    local[0] = arr
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, PartitionSpec("data")
    )
    f = jax.jit(shard_map(
        lambda x: jax.lax.psum(x, "data"), mesh=mesh,
        in_specs=PartitionSpec("data"), out_specs=PartitionSpec(),
    ))
    out = multihost_utils.global_array_to_host_local_array(
        f(garr), mesh, PartitionSpec()
    )
    return np.asarray(out)[0]


# ---------------------------------------------------------------------
# the distributed polish driver
# ---------------------------------------------------------------------

def polish_pod_distributed(
    debug: Optional[str],
    fraction_invalid: float,
    fraction_valid: float,
    max_errors: int,
    min_depth: int,
    careful: bool,
    assembly: str,
    sam: List[str],
    out: Optional[TextIO] = None,
    n_threads: Optional[int] = None,
) -> List[Tuple[str, int]]:
    """Polish with the SAM ingest sharded across ``jax.process_count()``
    real processes.  Process 0 writes the FASTA/--debug TSV; every
    process returns the (identical) new contig lengths.  Byte-identical
    to single-process polish()."""
    import ctypes

    import jax

    from polypolish_tpu.native import binding
    from polypolish_tpu.native import runs as native_runs

    start_time = time.monotonic()
    n_procs = jax.process_count()
    proc_idx = jax.process_index()
    is_root = proc_idx == 0
    if out is None:
        out = sys.stdout
    quiet_ctx = log.quiet() if not is_root else None
    if quiet_ctx is not None:
        quiet_ctx.__enter__()
    try:
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
        local_vocab = Vocab()
        shard = native_runs.parse_runs(
            [str(s) for s in sam], contig_names, contig_lens, local_vocab,
            max_errors, careful, n_threads, proc_idx=proc_idx,
            n_procs=n_procs,
        )

        # ---- exchange: vocab strings, file stats, run headers --------
        base = DENSE_V
        vocab_blob = "\n".join(local_vocab.strings[base:]).encode("latin-1")
        blobs = _allgather_var(np.frombuffer(vocab_blob, dtype=np.uint8))
        shard_vocabs = []
        for b in blobs:
            v = Vocab()
            s = bytes(b.tobytes()).decode("latin-1")
            if s:
                for token in s.split("\n"):
                    v.intern(token)
            shard_vocabs.append(v)
        vocab, remaps = merge_vocabs(shard_vocabs)
        remap = remaps[proc_idx]

        stats = np.asarray(shard.file_stats, dtype=np.int64).reshape(-1)
        all_stats = _allgather_var(stats)
        stats_list = []
        for f, s_path in enumerate(sam):
            a = sum(int(st[3 * f + 0]) for st in all_stats)
            u = sum(int(st[3 * f + 1]) for st in all_stats)
            r = sum(int(st[3 * f + 2]) for st in all_stats)
            if a == 0:
                quit_with_error(f'no alignments in "{s_path}"')
            stats_list.append((a, u, r))
        _report_alignment_stats(sam, stats_list, careful)
        log.eprint(
            f"Pod mode: SAM ingest sharded over {n_procs} processes "
            f"({jax.device_count()} devices)"
        )
        log.eprint()

        # run headers in reference order: file-major, shard ranges
        # ascending within each file (16 bytes per alignment on the wire)
        rc, rs, rl, rk, _vb, _oi, _ov, _poff = shard.raw()
        file_runs = np.asarray(shard.file_runs, dtype=np.int64)
        all_file_runs = _allgather_var(file_runs)
        gathered_cols = []
        for col in (rc, rs, rl, rk):
            per_proc = _allgather_var(np.ascontiguousarray(col))
            parts = []
            for f in range(len(sam)):
                for p in range(n_procs):
                    bounds = np.concatenate(
                        ([0], np.cumsum(all_file_runs[p]))
                    )
                    lo, hi = int(bounds[f]), int(bounds[f + 1])
                    parts.append(per_proc[p][lo:hi])
            gathered_cols.append(
                np.ascontiguousarray(np.concatenate(parts), dtype=np.int32)
            )
        hrc, hrs, hrl, hrk = gathered_cols

        log.section_header("Polishing assembly sequences")
        log.explanation(
            "For each position in the assembly, Polypolish determines the "
            "read depth at that position and collects all aligned bases. "
            "It then polishes the assembly by looking for positions where "
            "the pileup unambiguously supports a different sequence than "
            "the assembly."
        )
        debug_file = _create_debug_file(debug) if is_root else None
        lib = binding.load_library()
        new_lengths = []
        devnull = None
        try:
            for name, description in seq_names:
                seq = contig_seq[name]
                P = contig_lens[name]
                log.eprint(
                    f"Polishing {name} ({log.thousands(len(seq))} bp):"
                )
                if _device_votes():
                    # TPU-native pod path: each process votes its SAM
                    # shard on ITS OWN chip with the lanes kernel
                    # (1 B/event upload, ops/vote_lanes.py) and only the
                    # (8, P) integer counts ride the psum — the host
                    # fold never materialises.  Counts are exactly
                    # associative, so this is bitwise-identical to the
                    # host fold (asserted in tests/test_pod_distributed).
                    from polypolish_tpu.models.polisher import LanesPolisher
                    from polypolish_tpu.pipeline.polish import _pad_bucket

                    # geometric position bucket: contigs of similar
                    # length share one compiled graph (mirrors
                    # _polish_device_runs)
                    p_pad = _pad_bucket(P)
                    model = _MODEL_CACHE.get(("lanes", p_pad))
                    if model is None:
                        model = LanesPolisher(p_pad)
                        _MODEL_CACHE[("lanes", p_pad)] = model
                    pack = shard.lanes(name, model.r_sub, model.tile_w,
                                       num_positions=p_pad,
                                       packed4=(model.body == "packed4"),
                                       cap=True)
                    if pack is not None:
                        counts_local = np.asarray(
                            model.vote_counts(pack.vb, pack.block_tile,
                                              pack.ov_pos, pack.ov_vid)
                        )[:, :P]
                        pack.close()
                        sp, sv, sc = shard.sparse(name)
                    else:  # allocation failure -> host fold fallback
                        counts_local, _d, (sp, sv, sc) = shard.fold(name)
                else:
                    counts_local, _d, (sp, sv, sc) = shard.fold(name)
                counts = _psum_i32(counts_local)

                # sparse tier: remap local ids to the merged vocab, then
                # allgather + exact integer merge (identical everywhere)
                sv = sv.astype(np.int64)
                high = sv >= shard.base_vocab_len
                if high.any():
                    sv = sv.copy()
                    sv[high] = remap[sv[high] - shard.base_vocab_len]
                keys = sp * (2 ** 31) + sv
                all_keys = np.concatenate(_allgather_var(keys))
                all_cnts = np.concatenate(
                    _allgather_var(sc.astype(np.int64))
                )
                if all_keys.size:
                    uk, inv = np.unique(all_keys, return_inverse=True)
                    cnt = np.zeros(uk.shape[0], dtype=np.int64)
                    np.add.at(cnt, inv, all_cnts)
                    sparse = (uk // (2 ** 31), uk % (2 ** 31), cnt)
                else:
                    e = np.empty(0, dtype=np.int64)
                    sparse = (e, e, e)

                # exact depth: replay gathered headers in reference order
                depth = np.empty(P, dtype=np.float64)
                cid = contig_names.index(name)
                lib.pp_depth_fold(
                    hrc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    hrs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    hrl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    hrk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    hrc.shape[0], cid, P,
                    depth.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                )

                valid_thr, invalid_thr, low_depth = compute_thresholds(
                    depth, min_depth, fraction_valid, fraction_invalid
                )
                orig_id = _orig_ids_for_seq(seq, vocab)
                new_id, status = consensus_dense_numpy(
                    counts, valid_thr, invalid_thr, low_depth, orig_id
                )
                if is_root:
                    sink = out
                else:
                    import io as _io

                    devnull = _io.StringIO()
                    sink = devnull
                new_length = finish_sequence(
                    name, description, seq, counts, depth, sparse,
                    valid_thr, invalid_thr, new_id, status, orig_id,
                    min_depth, vocab, sink, debug_file,
                )
                new_lengths.append((name, new_length))
        finally:
            if debug_file is not None:
                debug_file.close()
            shard.close()
        finished_message(debug, new_lengths, start_time)
        return new_lengths
    finally:
        if quiet_ctx is not None:
            quiet_ctx.__exit__(None, None, None)
