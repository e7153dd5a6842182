"""The ``polish`` workflow driver (reference: polish.rs:26-300).

Host orchestration: validate options, load the assembly into per-contig
vote accumulators, stream SAM files into vote events, then for each
contig run the vote-count + consensus passes and emit the polished FASTA
to stdout (stats to stderr, optional per-base debug TSV).

The heavy integer work (dense vote counts, consensus decision) runs on
the selected backend ("host" numpy, "xla", or "pallas"); the f64
depth/threshold arithmetic stays on the host for bit-exact parity with
the reference (see ops/vote.py and ops/consensus.py docstrings).
"""

from __future__ import annotations

import sys
import time
from typing import Dict, List, Optional, TextIO, Tuple

import numpy as np

from polypolish_tpu import __version__, log
from polypolish_tpu.errors import check_if_file_exists, quit_with_error
from polypolish_tpu.io.fasta import load_fasta, write_fasta_record
from polypolish_tpu.ops import pack
from polypolish_tpu.ops.consensus import (
    ST_CHANGED,
    STATUS_STRINGS,
    compute_thresholds,
    consensus_dense_jax,
    consensus_dense_numpy,
    consensus_sparse_override,
)
from polypolish_tpu.ops.vote import count_votes
from polypolish_tpu.stats import qscore
from polypolish_tpu.utils.timing import format_duration
from polypolish_tpu.vocab import DENSE_V, Vocab


def fmt_f64(x: float) -> str:
    """Rust's f64 Display: integral values print without a trailing .0."""
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)


def polish(
    debug: Optional[str],
    fraction_invalid: float,
    fraction_valid: float,
    max_errors: int,
    min_depth: int,
    careful: bool,
    assembly: str,
    sam: List[str],
    out: Optional[TextIO] = None,
    backend: str = "host",
    use_native: bool = True,
    n_threads: Optional[int] = None,
) -> List[Tuple[str, int]]:
    """Run the full polish workflow; returns [(name, new_length)]."""
    start_time = time.monotonic()
    if out is None:
        out = sys.stdout
    check_option_values(fraction_invalid, fraction_valid)
    check_inputs_exist(assembly, sam)
    starting_message(
        debug, fraction_invalid, fraction_valid, max_errors, min_depth,
        careful, assembly, sam,
    )
    from polypolish_tpu.utils.profiling import maybe_trace, phase

    with phase("load_assembly"):
        seq_names, votes = load_assembly(assembly)
    vocab = Vocab()
    runs_handle = None
    with phase("load_alignments"):
        runs_handle = _load_alignments_runs(
            max_errors, careful, sam, votes, vocab, use_native, n_threads
        )
        if runs_handle is None:
            load_alignments(
                max_errors, careful, sam, votes, vocab, use_native, n_threads
            )
    try:
        with phase("polish_sequences"), maybe_trace():
            new_lengths = polish_sequences(
                debug, fraction_invalid, fraction_valid, min_depth,
                seq_names, votes, vocab, out, backend, use_native,
                runs_handle,
            )
    finally:
        if runs_handle is not None:
            runs_handle.close()
    finished_message(debug, new_lengths, start_time)
    return new_lengths


def check_option_values(fraction_invalid: float, fraction_valid: float) -> None:
    """Reference: polish.rs:277-287."""
    if fraction_valid <= 0.0 or fraction_valid >= 1.0:
        quit_with_error("--fraction_valid must be between 0 and 1 (exclusive)")
    if fraction_invalid <= 0.0 or fraction_invalid >= 1.0:
        quit_with_error("--fraction_invalid must be between 0 and 1 (exclusive)")
    if fraction_invalid >= fraction_valid:
        quit_with_error("--fraction_invalid must be less than --fraction_valid")


def check_inputs_exist(assembly: str, sam: List[str]) -> None:
    check_if_file_exists(assembly)
    for s in sam:
        check_if_file_exists(s)


def starting_message(
    debug, fraction_invalid, fraction_valid, max_errors, min_depth,
    careful, assembly, sam,
) -> None:
    log.section_header("Starting Polypolish-TPU polish")
    log.explanation(
        "Polypolish is a tool for polishing genome assemblies with short "
        "reads. Unlike other tools in this category, Polypolish uses SAM "
        "files where each read has been aligned to all possible locations "
        "(not just a single best location). This allows it to repair errors "
        "in repeat regions that other alignment-based polishers cannot fix."
    )
    log.eprint(f"Polypolish-TPU version: v{__version__}")
    log.eprint()
    log.eprint("Input assembly:")
    log.eprint(f"  {assembly}")
    log.eprint()
    log.eprint("Input short-read alignments:")
    for s in sam:
        log.eprint(f"  {s}")
    log.eprint()
    log.eprint("Settings:")
    log.eprint(f"  --fraction_invalid {fmt_f64(fraction_invalid)}")
    log.eprint(f"  --fraction_valid {fmt_f64(fraction_valid)}")
    log.eprint(f"  --max_errors {max_errors}")
    log.eprint(f"  --min_depth {min_depth}")
    if careful:
        log.eprint("  --careful")
    if debug is not None:
        log.eprint(f"  --debug {debug}")
    else:
        log.eprint("  not logging debugging information")
    log.eprint()


def finished_message(debug, new_lengths, start_time: float) -> None:
    log.section_header("Finished!")
    log.eprint("Polished sequence (to stdout):")
    for new_name, new_length in new_lengths:
        log.eprint(f"  {new_name}_polypolish ({log.thousands(new_length)} bp)")
    log.eprint()
    if debug is not None:
        log.eprint(f"Per-base debugging info written to {debug}")
    log.eprint(f"Time to run: {format_duration(time.monotonic() - start_time)}")
    log.eprint()


def load_assembly(assembly_filename: str):
    """Reference: polish.rs:93-106."""
    log.section_header("Loading assembly")
    fasta = load_fasta(assembly_filename)
    seq_names = []
    for name, description, sequence in fasta:
        log.eprint(f"{name} ({log.thousands(len(sequence))} bp)")
        seq_names.append((name, description))
    log.eprint()
    votes = pack.new_votes_from_fasta(fasta)
    return seq_names, votes


def _report_alignment_stats(sam, stats_list, careful: bool) -> None:
    """The per-file + kept/discarded stderr narrative (polish.rs:109-134).
    stats_list entries are (alignment_count, used_count, read_count)."""
    alignment_total = 0
    used_total = 0
    for s, (alignment_count, used_count, read_count) in zip(sam, stats_list):
        log.eprint(
            f"{s}: {log.thousands(alignment_count)} alignments from "
            f"{log.thousands(read_count)} reads"
        )
        alignment_total += alignment_count
        used_total += used_count
    discarded_count = alignment_total - used_total
    log.eprint()
    if careful:
        log.eprint(
            "Filtering for high-quality end-to-end alignments from reads "
            "with only one alignment:"
        )
    else:
        log.eprint("Filtering for high-quality end-to-end alignments:")
    log.eprint(f"  {log.thousands(used_total)} alignments kept")
    log.eprint(f"  {log.thousands(discarded_count)} alignments discarded")
    log.eprint()


def _load_alignments_runs(
    max_errors: int,
    careful: bool,
    sam: List[str],
    votes: Dict[str, pack.ContigVotes],
    vocab: Vocab,
    use_native: bool,
    n_threads: Optional[int],
):
    """Round-2 fast path: one native pp_parse_runs call covering ALL SAM
    files (byte-range parallel per file, files in reference order).
    Returns a ParsedRuns or None to fall back to the event-stream path
    (native unavailable, or gzipped input)."""
    if not use_native:
        return None
    try:
        from polypolish_tpu.native import loader
        from polypolish_tpu.native import runs as native_runs

        if not loader.available():
            return None
        # gzipped SAM and BAM inputs are handled natively since round 4
        # (LoadedInput inflates/converts to SAM text in sam_packer.cc)
    except OSError:
        return None
    log.section_header("Loading alignments")
    contig_names = list(votes.keys())
    contig_lens = {n: votes[n].length for n in contig_names}
    pr = native_runs.parse_runs(
        [str(s) for s in sam], contig_names, contig_lens, vocab,
        max_errors, careful, n_threads,
    )
    if n_threads == 1:  # batch mode: no per-genome fold threads
        pr.fold_parallel = False
    stats_list = [(a, u, r) for (a, u, r) in pr.file_stats]
    _report_alignment_stats(sam, stats_list, careful)
    return pr


def load_alignments(
    max_errors: int,
    careful: bool,
    sam: List[str],
    votes: Dict[str, pack.ContigVotes],
    vocab: Vocab,
    use_native: bool = True,
    n_threads: Optional[int] = None,
) -> None:
    """Reference: polish.rs:109-134."""
    log.section_header("Loading alignments")
    stats_list = _load_files_parallel(
        sam, votes, vocab, max_errors, careful, use_native, n_threads
    )
    if stats_list is None:
        process = _select_sam_processor(use_native, n_threads)
        stats_list = []
        for s in sam:
            stats_list.append(process(s, votes, vocab, max_errors, careful))
    _report_alignment_stats(sam, stats_list, careful)


def _load_files_parallel(
    sam, votes, vocab, max_errors, careful, use_native, n_threads
):
    """Parse multiple SAM files concurrently via the native packer.

    Each file is parsed into its own vote overlay with a snapshot copy
    of the vocab; overlays are merged in file order with newly interned
    ids deterministically remapped — the result is bit-identical to
    sequential processing.  Returns per-file stats, or None to fall back
    to the sequential path.
    """
    if not use_native or len(sam) < 2:
        return None
    try:
        from polypolish_tpu.native import loader

        if not loader.available():
            return None
        for s in sam:  # gzipped files take the Python fallback path
            with open(s, "rb") as f:
                head = f.read(2)
            if len(head) == 2 and head[0] == 31 and head[1] == 139:
                return None
    except OSError:
        return None

    import concurrent.futures

    from polypolish_tpu.native import binding

    base_n = len(vocab.strings)
    total_threads = n_threads or binding.default_threads()
    per_file = max(1, total_threads // len(sam))

    def parse_one(s):
        local_vocab = vocab.clone()
        local_votes = {
            name: pack.ContigVotes(cv.name, cv.description, cv.seq)
            for name, cv in votes.items()
        }
        stats = loader.process_sam_native(
            s, local_votes, local_vocab, max_errors, careful,
            n_threads=per_file,
        )
        return stats, local_votes, local_vocab

    with concurrent.futures.ThreadPoolExecutor(len(sam)) as pool:
        results = list(pool.map(parse_one, sam))

    stats_list = []
    for stats, local_votes, local_vocab in results:
        remap = None
        if len(local_vocab.strings) > base_n:
            remap = np.asarray(
                [vocab.intern(s) for s in local_vocab.strings[base_n:]],
                dtype=np.int32,
            )
        for name, cv in local_votes.items():
            p, v, w = cv.finalize()
            if p.size == 0:
                continue
            if remap is not None:
                high = v >= base_n
                if high.any():
                    v = v.copy()
                    v[high] = remap[v[high] - base_n]
            votes[name].extend_events(p, v, w)
        stats_list.append(stats)
    return stats_list


def _select_sam_processor(use_native: bool, n_threads: Optional[int] = None):
    if use_native:
        try:
            import functools

            from polypolish_tpu.native import loader

            if loader.available():
                return functools.partial(
                    loader.process_sam_native, n_threads=n_threads
                )
        except Exception:
            pass
    return pack.process_sam


def polish_sequences(
    debug, fraction_invalid, fraction_valid, min_depth,
    seq_names, votes, vocab, out: TextIO, backend: str,
    use_native: bool = True,
    runs_handle=None,
) -> List[Tuple[str, int]]:
    """Reference: polish.rs:137-154."""
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
            contig = votes[name]
            new_length = polish_one_sequence(
                fraction_invalid, fraction_valid, min_depth,
                name, description, contig, vocab, out, backend, debug_file,
                use_native, runs_handle,
            )
            new_lengths.append((name, new_length))
    finally:
        if debug_file is not None:
            debug_file.close()
    return new_lengths


def _create_debug_file(debug):
    if debug is None:
        return None
    try:
        f = open(debug, "wt")
    except OSError:
        quit_with_error(f'unable to create "{debug}"')
    f.write("name\tpos\tbase\tdepth\tinvalid\tvalid\tpileup\tstatus\tnew_base\n")
    return f


def _orig_ids_for_seq(seq: str, vocab: Vocab) -> np.ndarray:
    """Vocab id of each original assembly character."""
    arr = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
    table = np.full(256, -1, dtype=np.int32)
    for ch, vid in (("-", 0), ("A", 1), ("C", 2), ("G", 3), ("T", 4), ("N", 5)):
        table[ord(ch)] = vid
    ids = table[arr]
    missing = np.nonzero(ids < 0)[0]
    for i in missing:  # rare: IUPAC/odd chars in the assembly
        ids[i] = vocab.intern(seq[i])
    return ids


def polish_one_sequence(
    fraction_invalid, fraction_valid, min_depth,
    name, description, contig, vocab, out: TextIO, backend: str, debug_file,
    use_native: bool = True,
    runs_handle=None,
) -> int:
    """Reference: polish.rs:157-193 (vectorised)."""
    seq_len = contig.length
    log.eprint(f"Polishing {name} ({log.thousands(seq_len)} bp):")

    orig_id = _orig_ids_for_seq(contig.seq, vocab)

    if (runs_handle is not None and backend == "host"
            and debug_file is None and seq_len >= _window_min()
            and runs_handle.base_vocab_len <= DENSE_V):
        # huge-contig streaming path: O(window) working set instead of
        # O(P) full-length buffers (the 100 Mb single-host run was
        # minor-fault-bound over ~9 GB of buffers; see BENCH_NOTES.md)
        return _polish_host_runs_windowed(
            runs_handle, name, description, contig.seq, orig_id, vocab,
            out, min_depth, fraction_valid, fraction_invalid, use_native,
        )

    if (runs_handle is not None and backend == "pallas"
            and kernel_variant() == "lanes"
            and debug_file is None and seq_len >= _window_min()
            and runs_handle.base_vocab_len <= DENSE_V):
        # device twin of the streaming path (round-4): per-window lanes
        # packs (pp_lanes_from_runs w_lo) + thresholds from
        # pp_fold_window, all through ONE compiled window shape; host
        # memory stays O(window) and window k+1's pack/upload overlaps
        # window k's compute via jax async dispatch
        result = _polish_device_runs_windowed(
            runs_handle, name, description, contig.seq, orig_id, vocab,
            out, min_depth, fraction_valid, fraction_invalid, use_native,
        )
        if result is not None:
            return result

    if runs_handle is not None and backend == "host":
        from polypolish_tpu.native import binding

        counts, depth, sparse, thr = runs_handle.fold(
            name, thresholds=(min_depth, fraction_valid, fraction_invalid)
        )
        valid_thr, invalid_thr, low_depth = thr
        new_id, status = binding.consensus_dense_native(
            counts, valid_thr, invalid_thr, low_depth, orig_id
        )
    elif runs_handle is not None:
        (counts, new_id, status, depth, sparse,
         valid_thr, invalid_thr) = _polish_device_runs(
            runs_handle, name, seq_len, orig_id,
            min_depth, fraction_valid, fraction_invalid, backend,
        )
    elif backend == "host":
        pos, vid, weight = contig.finalize()
        counts, depth, sparse = count_votes(pos, vid, weight, seq_len, backend)
        valid_thr, invalid_thr, low_depth = compute_thresholds(
            depth, min_depth, fraction_valid, fraction_invalid
        )
        new_id, status = consensus_dense_numpy(
            counts, valid_thr, invalid_thr, low_depth, orig_id
        )
    else:
        pos, vid, weight = contig.finalize()
        (counts, new_id, status, depth, sparse,
         valid_thr, invalid_thr) = _polish_device(
            pos, vid, weight, seq_len, orig_id,
            min_depth, fraction_valid, fraction_invalid, backend,
        )

    return finish_sequence(
        name, description, contig.seq, counts, depth, sparse,
        valid_thr, invalid_thr, new_id, status, orig_id, min_depth,
        vocab, out, debug_file, use_native,
    )


def finish_sequence(
    name, description, seq, counts, depth, sparse,
    valid_thr, invalid_thr, new_id, status, orig_id, min_depth,
    vocab, out: TextIO, debug_file, use_native: bool = True,
) -> int:
    """The backend-independent tail of polish_one_sequence: sparse-tier
    consensus override, --debug TSV, polished FASTA write, per-contig
    stats (reference: polish.rs:170-227)."""
    # Override positions that have sparse-tier votes with the full
    # candidate-list consensus (vectorised, host).  Dense counts at
    # those few positions are gathered in one indexed fetch so device
    # backends never transfer the whole (8, P) tensor unless --debug
    # needs it.
    sp_pos, sp_vid, sp_cnt = sparse
    if sp_pos.size:
        consensus_sparse_override(
            counts, sp_pos, sp_vid, sp_cnt, valid_thr, invalid_thr,
            depth, min_depth, orig_id, new_id, status,
        )

    # the per-position dict is only needed for the --debug pileup column
    sparse_by_pos: Dict[int, List[Tuple[int, int]]] = {}
    if debug_file is not None and sp_pos.size:
        for p, v, c in zip(sp_pos.tolist(), sp_vid.tolist(),
                           sp_cnt.tolist()):
            sparse_by_pos.setdefault(p, []).append((v, c))

    if debug_file is not None:
        _write_debug_lines(
            debug_file, name, seq, depth, invalid_thr, valid_thr,
            np.asarray(counts), sparse_by_pos, status, new_id, vocab,
            use_native,
        )

    polished_seq = _apply_edits(seq, status, new_id, vocab)
    write_fasta_record(out, name, description, polished_seq)

    # Sequential left-fold, not np.sum (pairwise): the reference adds
    # per-base depths one at a time in position order (polish.rs:177) and
    # f64 addition is order-sensitive.  The native helper is a strict
    # sequential scan; np.cumsum's last element is the same exact
    # left-fold (used for --pure-python or when the lib is unavailable).
    if len(depth) == 0:
        total_depth = 0.0
    elif use_native:
        from polypolish_tpu.native import binding as _binding

        total_depth = _binding.sum_f64_seq(depth)
    else:
        total_depth = float(np.cumsum(depth)[-1])
    zero_depth_count = int(np.count_nonzero(depth == 0.0))
    changed_count = int(np.count_nonzero(status == ST_CHANGED))
    print_polishing_info(
        len(seq), total_depth, zero_depth_count, changed_count
    )
    return len(polished_seq)


def _window_min() -> int:
    """Contig length above which the host path streams position windows
    (POLYPOLISH_TPU_WINDOW_MIN; 0 disables windowing)."""
    import os

    try:
        v = int(os.environ.get("POLYPOLISH_TPU_WINDOW_MIN", 32_000_000))
    except ValueError:
        v = 32_000_000
    return v if v > 0 else (1 << 62)


def _window_size() -> int:
    """Window width for the streaming fold.  The 1 MiB floor applies
    only to the built-in default — an explicit POLYPOLISH_TPU_WINDOW may
    be arbitrarily small (tests use tiny windows on short genomes to
    exercise the multi-window boundary logic)."""
    import os

    raw = os.environ.get("POLYPOLISH_TPU_WINDOW")
    if raw is not None:
        try:
            v = int(raw)
            if v > 0:
                return v
        except ValueError:
            pass
    return 8_000_000


def _polish_host_runs_windowed(
    runs_handle, name, description, seq, orig_id, vocab, out,
    min_depth, fraction_valid, fraction_invalid, use_native,
) -> int:
    """Streaming host path for huge contigs: fold + consensus + stats in
    position windows of O(W) memory (pp_fold_window), with the
    reference's exact semantics — depth totals stay one strict f64
    left-fold via a carried accumulator, integer counts/consensus are
    window-local, and the sparse tier (from the overflow list) is
    overridden inside the window where its counts columns are resident.
    Reference scope: polish.rs:157-227 at 100 Mb scale."""
    from polypolish_tpu.native import binding

    seq_len = len(seq)
    sp_pos, sp_vid, sp_cnt = runs_handle.sparse(name)
    W = _window_size()
    thresholds = (min_depth, fraction_valid, fraction_invalid)

    changed_pos: List[np.ndarray] = []
    changed_vid: List[np.ndarray] = []
    total_depth = 0.0
    zero_depth_count = 0
    changed_count = 0
    for w_lo in range(0, seq_len, W):
        w_hi = min(seq_len, w_lo + W)
        counts_w, depth_w, thr_w = runs_handle.fold_window(
            name, w_lo, w_hi, thresholds
        )
        valid_w, invalid_w, low_w = thr_w
        orig_w = orig_id[w_lo:w_hi]
        new_id_w, status_w = binding.consensus_dense_native(
            counts_w, valid_w, invalid_w, low_w, orig_w
        )
        i0, i1 = np.searchsorted(sp_pos, [w_lo, w_hi])
        if i1 > i0:
            consensus_sparse_override(
                counts_w, sp_pos[i0:i1] - w_lo, sp_vid[i0:i1],
                sp_cnt[i0:i1], valid_w, invalid_w, depth_w, min_depth,
                orig_w, new_id_w, status_w,
            )
        ch = np.nonzero(status_w == ST_CHANGED)[0]
        if ch.size:
            changed_pos.append((ch + w_lo).astype(np.int64))
            changed_vid.append(new_id_w[ch].copy())
            changed_count += int(ch.size)
        # strict left-fold continuation (order parity with polish.rs:177)
        if use_native:
            total_depth = binding.sum_f64_seq_init(depth_w, total_depth)
        else:
            for v in depth_w:
                total_depth += float(v)
        zero_depth_count += int(np.count_nonzero(depth_w == 0.0))

    cp = (np.concatenate(changed_pos) if changed_pos
          else np.empty(0, np.int64))
    cv = (np.concatenate(changed_vid) if changed_vid
          else np.empty(0, np.int32))
    polished_seq = _apply_edits_sparse(seq, cp, cv, vocab)
    write_fasta_record(out, name, description, polished_seq)
    print_polishing_info(
        seq_len, total_depth, zero_depth_count, changed_count
    )
    return len(polished_seq)


def _polish_device_runs_windowed(
    runs_handle, name, description, seq, orig_id, vocab, out,
    min_depth, fraction_valid, fraction_invalid, use_native,
):
    """Streaming DEVICE path for huge contigs (polish.rs:170-187 at
    100 Mb scale, round-4): thresholds/depth from pp_fold_window
    (O(window) host buffers, no host counts fold), votes from the lanes
    kernel on per-window native packs (pp_lanes_from_runs with a window
    origin), decisions fetched as uint8.  Every window shares one
    compiled shape; the next window's pack + upload is issued before
    the previous window's results are fetched, so transfers overlap
    compute.  Returns the new length, or None to fall back (native
    pack unavailable)."""
    import jax.numpy as jnp

    from polypolish_tpu.models.polisher import LanesPolisher
    from polypolish_tpu.native import binding

    seq_len = len(seq)
    sp_pos, sp_vid, sp_cnt = runs_handle.sparse(name)
    thresholds = (min_depth, fraction_valid, fraction_invalid)

    from polypolish_tpu.ops.vote_lanes import TILE_W

    w_pad = -(-_window_size() // TILE_W) * TILE_W
    key = ("lanes_windowed", w_pad)
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = LanesPolisher(w_pad)
        _MODEL_CACHE[key] = model
    i32max = np.int32(2**31 - 1)

    def pad_w(arr, fill, dtype):
        out_a = np.full(w_pad, fill, dtype=dtype)
        out_a[: arr.shape[0]] = arr
        return jnp.asarray(out_a)

    changed_pos: List[np.ndarray] = []
    changed_vid: List[np.ndarray] = []
    total_depth = 0.0
    zero_depth_count = 0
    changed_count = 0

    # in-flight window pipeline: window k+depth's pack/upload is issued
    # before window k's results are fetched.  Default depth 2 (measured
    # -28% at 100 Mb even on the tunnel: window k+1's pack+upload
    # overlaps window k's compute AND window k-1's fetch; depth 3 adds
    # no overlap a single-transfer link can use — BENCH_NOTES round 5).
    # Each slot holds a pack + the sparse-column gather, ~1.1x window
    # bytes since the full counts tensor is no longer retained.
    import collections
    import os as _os

    try:
        depth_slots = max(1, int(_os.environ.get(
            "POLYPOLISH_TPU_WINDOW_DEPTH", 2)))
    except ValueError:
        depth_slots = 2
    pending = collections.deque()  # (w_lo, w_hi, pack, counts_j,
    #                                adopted_u8, status_u8, depth_w,
    #                                thr copies)

    def finish_window(p):
        nonlocal total_depth, zero_depth_count, changed_count
        (w_lo, w_hi, pack, cols_j, adopted_u8, status_u8,
         depth_w, valid_w, invalid_w) = p
        w_real = w_hi - w_lo
        status = np.array(status_u8)[:w_real].astype(np.int32)
        adopted = np.array(adopted_u8)[:w_real].astype(np.int32)
        orig_w = orig_id[w_lo:w_hi]
        new_id_w = np.where(status == ST_CHANGED, adopted, orig_w)
        new_id_w = new_id_w.astype(np.int32)
        i0, i1 = np.searchsorted(sp_pos, [w_lo, w_hi])
        if i1 > i0:
            # cols_j = pre-gathered (8, n_unique) sparse-position
            # columns (gathered on device at enqueue; the full window
            # counts tensor was dropped immediately)
            consensus_sparse_override(
                cols_j, sp_pos[i0:i1] - w_lo,
                sp_vid[i0:i1], sp_cnt[i0:i1], valid_w, invalid_w,
                depth_w, min_depth, orig_w, new_id_w, status,
            )
        ch = np.nonzero(status == ST_CHANGED)[0]
        if ch.size:
            changed_pos.append((ch + w_lo).astype(np.int64))
            changed_vid.append(new_id_w[ch].copy())
            changed_count += int(ch.size)
        if use_native:
            total_depth = binding.sum_f64_seq_init(depth_w, total_depth)
        else:
            for v in depth_w:
                total_depth += float(v)
        zero_depth_count += int(np.count_nonzero(depth_w == 0.0))
        # outputs are materialised -> uploads finished; safe to release
        # the native pack buffer (device_put may alias host memory on
        # the CPU backend, so the pack must outlive the fetch)
        pack.close()

    try:
        for w_lo in range(0, seq_len, w_pad):
            w_hi = min(seq_len, w_lo + w_pad)
            _c, depth_w, thr_w = runs_handle.fold_window(
                name, w_lo, w_hi, thresholds, want_counts=False
            )
            valid_w, invalid_w, low_w = thr_w
            pack = runs_handle.lanes(
                name, model.r_sub, model.tile_w, num_positions=w_pad,
                packed4=(model.body == "packed4"), cap=True, w_lo=w_lo,
            )
            if pack is None:
                return None  # fall back to the non-windowed paths
            counts_j, adopted_u8, status_u8 = model.forward_pack(
                pack.vb, pack.block_tile,
                pad_w(valid_w, i32max, np.int32),
                pad_w(invalid_w, i32max, np.int32),
                pad_w(low_w, True, bool),
                pad_w(orig_id[w_lo:w_hi], 0, np.int32),
                ov_pos=pack.ov_pos, ov_vid=pack.ov_vid,
            )
            # keep only the sparse-position columns in flight: the full
            # (8, W) counts (256 MB/window at the default width, plus
            # the tunnel backend's host mirror) would otherwise live for
            # depth+1 windows — the dominant device-path RSS term
            i0, i1 = np.searchsorted(sp_pos, [w_lo, w_hi])
            if i1 > i0:
                upos_local = np.unique(sp_pos[i0:i1] - w_lo)
                cols_j = counts_j[:, jnp.asarray(upos_local)]
            else:
                cols_j = None
            del counts_j
            pending.append((w_lo, w_hi, pack, cols_j, adopted_u8,
                            status_u8, depth_w.copy(), valid_w.copy(),
                            invalid_w.copy()))
            while len(pending) > depth_slots:
                finish_window(pending.popleft())  # fetch old while new computes
        while pending:
            finish_window(pending.popleft())
    finally:
        # mid-stream bail-out (pack None -> fallback, or an exception):
        # release any native pack buffers still queued, else they live
        # until GC while the fallback path re-polishes the contig
        for p in pending:
            p[2].close()
        pending.clear()

    cp = (np.concatenate(changed_pos) if changed_pos
          else np.empty(0, np.int64))
    cv = (np.concatenate(changed_vid) if changed_vid
          else np.empty(0, np.int32))
    polished_seq = _apply_edits_sparse(seq, cp, cv, vocab)
    write_fasta_record(out, name, description, polished_seq)
    print_polishing_info(
        seq_len, total_depth, zero_depth_count, changed_count
    )
    return len(polished_seq)


def kernel_variant() -> str:
    """Device vote-kernel selection: 'lanes' (round-3 lane-aligned VPU
    kernel, default) or 'mxu' (round-2 one-hot-matmul kernels).  Set via
    POLYPOLISH_TPU_KERNEL (the CLI --kernel-variant flag maps to it)."""
    import os

    v = os.environ.get("POLYPOLISH_TPU_KERNEL", "lanes")
    return v if v in ("lanes", "mxu") else "lanes"


def _pad_bucket(n: int, granularity_bits: int = 3, minimum: int = 4096) -> int:
    """Round n up to a geometric bucket (<= 12.5% padding) so jitted
    device graphs are shared across contigs of similar length instead of
    recompiling per exact contig length."""
    from polypolish_tpu.ops.vote_lanes import geom_pad

    return geom_pad(n, bits=granularity_bits, minimum=minimum)


_MODEL_CACHE: Dict = {}


def _polish_sharded_lanes(
    runs_handle, mesh, name, seq_len,
    valid_thr, invalid_thr, low_depth, orig_id,
):
    """The flagship SPMD step: native one-call lanes mesh pack ->
    lane-aligned VPU vote kernel per (data, pos) shard -> int psum ->
    position-sharded consensus.  Returns (counts, new_id, status) or
    None (native pack unavailable -> caller falls back to the XLA
    scatter step).  Bitwise-identical to the host fold across mesh
    shapes (tests/test_lanes_mesh.py, tests/test_sharded_backend.py)."""
    import jax.numpy as jnp

    from polypolish_tpu.ops import vote_lanes
    from polypolish_tpu.parallel import get_sharded_polish_step_lanes

    n_data, n_pos = mesh.devices.shape
    try:
        # geometric position bucket: contigs of similar length share
        # one shard geometry and therefore one compiled SPMD step
        packed = runs_handle.lanes_mesh(
            name, n_data, n_pos, vote_lanes.R_SUB, vote_lanes.TILE_W,
            num_positions=_pad_bucket(seq_len), packed4=True,
        )
    except Exception:
        return None
    if packed is None:
        return None
    vb, bt, p_shard, n_tiles = packed
    p_total = p_shard * n_pos

    def pad_p(arr, fill, dtype):
        out = np.full(p_total, fill, dtype=dtype)
        out[:seq_len] = arr
        return jnp.asarray(out)

    step = get_sharded_polish_step_lanes(mesh, p_shard, n_tiles)
    i32max = np.int32(2**31 - 1)
    counts_j, new_id_j, status_j = step(
        jnp.asarray(vb), jnp.asarray(bt),
        pad_p(valid_thr, i32max, np.int32),
        pad_p(invalid_thr, i32max, np.int32),
        pad_p(low_depth, True, bool),
        pad_p(orig_id, 0, np.int32),
    )
    counts = counts_j[:, :seq_len]
    new_id = np.array(new_id_j)[:seq_len]
    status = np.array(status_j)[:seq_len]
    return counts, new_id, status


def _polish_device_runs(
    runs_handle, name, seq_len, orig_id,
    min_depth, fraction_valid, fraction_invalid, backend,
):
    """Device path fed by the native run pipeline: depth folded in C++
    (sequential-exact f64), sparse tier from the overflow list, and the
    vote+consensus graph fed with compact uint8 chunks (pad = vocab 255,
    2 bytes/event on the wire)."""
    import jax.numpy as jnp

    from polypolish_tpu.models.polisher import PolisherModel
    from polypolish_tpu.ops.vote_pallas import E_SUB, TILE_P

    _, depth, _, thr = runs_handle.fold(
        name, want_counts=False,
        thresholds=(min_depth, fraction_valid, fraction_invalid),
    )
    valid_thr, invalid_thr, low_depth = thr
    sparse = runs_handle.sparse(name)

    if backend == "sharded":
        from polypolish_tpu.parallel import make_mesh, sharded_vote_consensus

        mesh = _MODEL_CACHE.get("mesh")
        if mesh is None:
            mesh = make_mesh()
            _MODEL_CACHE["mesh"] = mesh

        if kernel_variant() == "lanes":
            # production multi-chip path: the one-call native mesh pack
            # (pp_lanes_mesh, packed4 layout in C++) feeding the
            # lane-aligned VPU kernel per shard + exact int psum over
            # 'data' (replaces pileup.rs:56-65 at pod scale; the XLA
            # scatter step below stays as the no-native fallback)
            result = _polish_sharded_lanes(
                runs_handle, mesh, name, seq_len,
                valid_thr, invalid_thr, low_depth, orig_id,
            )
            if result is not None:
                counts, new_id, status = result
                return (counts, new_id, status, depth, sparse,
                        valid_thr, invalid_thr)

        pos, vid, _w = runs_handle.events(name)
        counts, new_id, status = sharded_vote_consensus(
            mesh, pos, vid, seq_len,
            valid_thr, invalid_thr, low_depth, orig_id,
        )
        return counts, new_id, status, depth, sparse, valid_thr, invalid_thr

    p_pad = _pad_bucket(seq_len)
    i32max = np.int32(2**31 - 1)

    def pad(arr, fill, dtype):
        out = np.full(p_pad, fill, dtype=dtype)
        out[:seq_len] = arr
        return jnp.asarray(out)

    thr_args = (
        pad(valid_thr, i32max, np.int32),
        pad(invalid_thr, i32max, np.int32),
        pad(low_depth, True, bool),
        pad(orig_id, 0, np.int32),
    )

    if backend == "pallas" and kernel_variant() == "lanes":
        # round-3 flagship device path: lane-aligned VPU kernel fed by
        # the native byte packer (1 B/event wire format, slab uploads
        # overlapped with compute in LanesPolisher.vote_counts)
        from polypolish_tpu.models.polisher import LanesPolisher

        key = (p_pad, "lanes")
        model = _MODEL_CACHE.get(key)
        if model is None:
            model = LanesPolisher(p_pad)
            _MODEL_CACHE[key] = model
        pack = runs_handle.lanes(
            name, model.r_sub, model.tile_w, num_positions=p_pad,
            packed4=(model.body == "packed4"), cap=True,
        )
        if pack is not None:
            counts_j, adopted_u8, status_u8 = model.forward_pack(
                pack.vb, pack.block_tile, *thr_args,
                ov_pos=pack.ov_pos, ov_vid=pack.ov_vid,
            )
            counts = counts_j[:, :seq_len]
            # compact uint8 fetch; new_id reconstructed host-side (see
            # LanesPolisher._finish): CHANGED adopts the dense id, every
            # keep status keeps the (possibly sparse) original id
            status = np.array(status_u8)[:seq_len].astype(np.int32)
            adopted = np.array(adopted_u8)[:seq_len].astype(np.int32)
            new_id = np.where(status == ST_CHANGED, adopted, orig_id)
            new_id = new_id.astype(np.int32)
            # outputs are materialised -> uploads finished; safe to
            # release the native pack buffer
            pack.close()
            return (counts, new_id, status, depth, sparse, valid_thr,
                    invalid_thr)

    key = (p_pad, backend)
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = PolisherModel(p_pad, use_pallas=(backend == "pallas"))
        _MODEL_CACHE[key] = model

    ch = runs_handle.chunks(name, TILE_P, E_SUB, num_positions=p_pad)
    if ch is None:  # tile_p > 256: fall back to the numpy packer
        pos, vid, _w = runs_handle.events(name)
        chunk_pos, chunk_vocab, chunk_tile = model.pack(pos, vid)
    else:
        chunk_pos, chunk_vocab, chunk_tile = (
            jnp.asarray(ch[0]), jnp.asarray(ch[1]), jnp.asarray(ch[2])
        )
    counts_j, new_id_j, status_j = model.forward_jit(
        chunk_pos, chunk_vocab, chunk_tile, *thr_args
    )
    counts = counts_j[:, :seq_len]
    new_id = np.array(new_id_j)[:seq_len]
    status = np.array(status_j)[:seq_len]
    return counts, new_id, status, depth, sparse, valid_thr, invalid_thr


def _polish_device(
    pos, vid, weight, seq_len, orig_id,
    min_depth, fraction_valid, fraction_invalid, backend,
):
    """Device execution path: the whole integer pipeline (vote counts +
    consensus) runs as one jitted forward step; only the order-sensitive
    f64 depth/threshold math stays on the host.  The position axis is
    padded to a geometric bucket (pad positions: low_depth=True,
    valid/invalid=INT32_MAX, orig_id=0 -> status LOW_DEPTH keep)."""
    import jax.numpy as jnp

    from polypolish_tpu.models.polisher import PolisherModel
    from polypolish_tpu.ops.vote import depth_host, sparse_counts_host

    depth = depth_host(pos, weight, seq_len)
    sparse = sparse_counts_host(pos, vid)
    valid_thr, invalid_thr, low_depth = compute_thresholds(
        depth, min_depth, fraction_valid, fraction_invalid
    )

    if backend == "sharded":
        from polypolish_tpu.parallel import (
            make_mesh,
            sharded_vote_consensus,
            sharded_vote_consensus_lanes,
        )

        mesh = _MODEL_CACHE.get("mesh")
        if mesh is None:
            mesh = make_mesh()
            _MODEL_CACHE["mesh"] = mesh
        if kernel_variant() == "lanes":
            # lanes SPMD step fed by the vectorised numpy mesh packer
            # (this path has no native runs handle — gzip input or
            # --pure-python parse)
            counts, new_id, status = sharded_vote_consensus_lanes(
                mesh, pos, vid, seq_len,
                valid_thr, invalid_thr, low_depth, orig_id,
            )
        else:
            counts, new_id, status = sharded_vote_consensus(
                mesh, pos, vid, seq_len,
                valid_thr, invalid_thr, low_depth, orig_id,
            )
        return counts, new_id, status, depth, sparse, valid_thr, invalid_thr

    p_pad = _pad_bucket(seq_len)
    i32max = np.int32(2**31 - 1)

    def pad(arr, fill, dtype):
        out = np.full(p_pad, fill, dtype=dtype)
        out[:seq_len] = arr
        return jnp.asarray(out)

    key = (p_pad, backend)
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = PolisherModel(p_pad, use_pallas=(backend == "pallas"))
        _MODEL_CACHE[key] = model

    thr_args = (
        pad(valid_thr, i32max, np.int32),
        pad(invalid_thr, i32max, np.int32),
        pad(low_depth, True, bool),
        pad(orig_id, 0, np.int32),
    )
    if backend == "pallas":
        chunk_pos, chunk_vocab, chunk_tile = model.pack(pos, vid)
        counts_j, new_id_j, status_j = model.forward_jit(
            chunk_pos, chunk_vocab, chunk_tile, *thr_args
        )
    else:
        from polypolish_tpu.ops.vote import dense_counts_xla

        counts_j = dense_counts_xla(
            jnp.asarray(pos, jnp.int32), jnp.asarray(vid, jnp.int32), p_pad
        )
        new_id_j, status_j = consensus_dense_jax(counts_j, *thr_args)
    # counts stay a device array (sliced lazily); callers gather only
    # the columns they need, or np.asarray() for --debug
    counts = counts_j[:, :seq_len]
    new_id = np.array(new_id_j)[:seq_len]
    status = np.array(status_j)[:seq_len]
    return counts, new_id, status, depth, sparse, valid_thr, invalid_thr


def _apply_edits(seq: str, status: np.ndarray, new_id: np.ndarray, vocab: Vocab) -> str:
    """Polished sequence = original with CHANGED positions spliced in.

    All keep statuses emit the original character; Changed positions emit
    the adopted vocab string ('-' id 0 -> deletion).  Equivalent to the
    reference's per-base string build + ``replace("-","")``
    (polish.rs:170-188) but O(changes) instead of O(len).
    """
    changed = np.nonzero(status == ST_CHANGED)[0]
    return _apply_edits_sparse(seq, changed, new_id[changed], vocab)


def _apply_edits_sparse(seq: str, changed_pos, changed_vid, vocab: Vocab) -> str:
    """_apply_edits from an explicit (positions, adopted ids) edit list
    (the windowed path collects edits per window instead of holding
    full-length status/new_id arrays)."""
    if changed_pos.size == 0:
        # The reference strips "-" from the whole polished string
        # (polish.rs:188), which also removes literal '-' chars that were
        # present in the assembly itself.
        return seq.replace("-", "") if "-" in seq else seq
    parts: List[str] = []
    prev = 0
    for p, vid in zip(changed_pos.tolist(), changed_vid.tolist()):
        parts.append(seq[prev:p])
        if vid != 0:
            parts.append(vocab.string(int(vid)))
        prev = p + 1
    parts.append(seq[prev:])
    polished = "".join(parts)
    return polished.replace("-", "") if "-" in polished else polished


def pileup_count_str(counts_col, sparse_items, vocab: Vocab) -> str:
    """The debug "pileup" column: sorted comma-joined SEQxCOUNT entries
    (reference: pileup.rs:137-148)."""
    entries = []
    for v in range(DENSE_V):
        c = int(counts_col[v])
        if c > 0:
            entries.append(f"{vocab.string(v)}x{c}")
    for v, c in sparse_items:
        entries.append(f"{vocab.string(v)}x{c}")
    entries.sort()
    return ",".join(entries)


def _write_debug_lines_native(
    debug_file, name, seq, depth, invalid_thr, valid_thr, counts,
    sparse_by_pos, status, new_id, vocab,
) -> bool:
    """Try the C++ streaming TSV writer; False -> use the Python loop.

    Gated to ASCII content (non-ASCII vocab/sequence characters would be
    encoded utf-8 by the Python text stream but latin-1 by the native
    writer — never the case for real SAM/FASTA input, but the fallback
    keeps even that path byte-consistent)."""
    try:
        from polypolish_tpu.native import binding, loader

        if not loader.available():
            return False
        if not (seq.isascii() and name.isascii()
                and all(s.isascii() for s in vocab.strings)):
            return False
    except Exception:
        return False
    # past this point real errors (e.g. disk full) must propagate — the
    # native writer may have already emitted bytes, so falling back to
    # the Python loop would duplicate lines
    if sparse_by_pos:
        sp_pos_l: List[int] = []
        sp_vid_l: List[int] = []
        sp_cnt_l: List[int] = []
        for p in sorted(sparse_by_pos):
            for v, c in sparse_by_pos[p]:
                sp_pos_l.append(p)
                sp_vid_l.append(v)
                sp_cnt_l.append(c)
        sp = (np.asarray(sp_pos_l, dtype=np.int64),
              np.asarray(sp_vid_l, dtype=np.int32),
              np.asarray(sp_cnt_l, dtype=np.int32))
    else:
        sp = (np.empty(0, np.int64), np.empty(0, np.int32),
              np.empty(0, np.int32))
    binding.debug_tsv_native(
        debug_file, name, seq, depth, invalid_thr, valid_thr, counts,
        *sp, status, new_id, ST_CHANGED, vocab.strings, STATUS_STRINGS,
    )
    return True


def _write_debug_lines(
    debug_file, name, seq, depth, invalid_thr, valid_thr, counts,
    sparse_by_pos, status, new_id, vocab, use_native: bool = True,
) -> None:
    """Per-base debug TSV (reference: polish.rs:230-266, pileup.rs:137-166).

    Columns: name pos base depth invalid valid pileup status new_base,
    with the pileup column as sorted comma-joined "SEQxCOUNT" entries.
    Uses the native (C++) streaming writer when available; the Python
    loop below is the byte-identical fallback.
    """
    if use_native and _write_debug_lines_native(
        debug_file, name, seq, depth, invalid_thr, valid_thr, counts,
        sparse_by_pos, status, new_id, vocab,
    ):
        return
    for p in range(len(seq)):
        count_str = pileup_count_str(
            counts[:, p], sparse_by_pos.get(p, ()), vocab
        )
        st = int(status[p])
        nid = int(new_id[p])
        new_base = vocab.string(nid) if st == ST_CHANGED else seq[p]
        debug_file.write(
            f"{name}\t{p}\t{seq[p]}\t{depth[p]:.1f}\t{int(invalid_thr[p])}\t"
            f"{int(valid_thr[p])}\t{count_str}\t{STATUS_STRINGS[st]}\t"
            f"{new_base}\n"
        )


def print_polishing_info(
    seq_len: int, total_depth: float, zero_depth_count: int, changed_count: int
) -> None:
    """Reference: polish.rs:206-227."""
    seq_len_f = float(seq_len)
    mean_depth = total_depth / seq_len_f
    log.eprint(f"  mean read depth: {mean_depth:.1f}x")

    have = "has" if zero_depth_count == 1 else "have"
    covered = seq_len - zero_depth_count
    coverage = 100.0 * covered / seq_len_f
    log.eprint(
        f"  {log.thousands(zero_depth_count)} bp {have} a depth of zero "
        f"({coverage:.4f}% coverage)"
    )

    changed_percent = 100.0 * changed_count / seq_len_f
    estimated_accuracy = 100.0 - changed_percent
    estimated_qscore = qscore(estimated_accuracy)
    positions = "position" if changed_count == 1 else "positions"
    log.eprint(
        f"  {log.thousands(changed_count)} {positions} changed "
        f"({changed_percent:.4f}% of total positions)"
    )
    log.eprint(
        f"  estimated pre-polishing sequence accuracy: "
        f"{estimated_accuracy:.4f}% ({estimated_qscore})"
    )
    log.eprint()
