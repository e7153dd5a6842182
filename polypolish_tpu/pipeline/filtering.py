"""The ``filter`` workflow driver (reference: filter.rs:26-377).

Pre-screens paired-end SAM files: learns the correct pair orientation and
insert-size thresholds from uniquely-mapped pairs, then re-streams both
inputs tagging discordant alignments with ``ZP:Z:fail`` (which the
polish pass treats as a QC failure, alignment.rs:72-74).

The per-alignment pass rule (filter.rs:352-377) is evaluated as one flat
vectorised (alignment x pair-alignment) grid + segment-any reduction
instead of the reference's per-line nested loops.
"""

from __future__ import annotations

import time
from typing import Dict, List, Tuple

import numpy as np

from polypolish_tpu import __version__, log
from polypolish_tpu.errors import quit_with_error
from polypolish_tpu.io.sam import TooFewColumns, parse_alignment_quick
from polypolish_tpu.ops import pairfilter
from polypolish_tpu.ops.pairfilter import ORIENTATION_NAMES
from polypolish_tpu.utils.timing import format_duration

# Flat pair grids bigger than this go through the jitted JAX kernel.
_JAX_GRID_THRESHOLD = 1_000_000


class _FileAlignments:
    """Column arrays for one SAM file's aligned records, in file order."""

    __slots__ = ("flags", "ref_id", "start", "end", "name_idx",
                 "line_end")

    def __init__(self) -> None:
        self.flags: List[int] = []
        self.ref_id: List[int] = []
        self.start: List[int] = []
        self.end: List[int] = []
        self.name_idx: List[int] = []
        # aligned-record raw line-end byte offsets (native quick-parse
        # only); lets the verdict rewrite run scan-free
        self.line_end = None

    def finalize(self) -> None:
        self.flags = np.asarray(self.flags, dtype=np.int32)
        self.ref_id = np.asarray(self.ref_id, dtype=np.int32)
        self.start = np.asarray(self.start, dtype=np.int64)
        self.end = np.asarray(self.end, dtype=np.int64)
        self.name_idx = np.asarray(self.name_idx, dtype=np.int64)

    def __len__(self) -> int:
        return len(self.flags)


def filter_pairs(
    in1: str,
    in2: str,
    out1: str,
    out2: str,
    orientation: str = "auto",
    low: float = 0.1,
    high: float = 99.9,
) -> Tuple[int, int]:
    """Run the filter workflow; returns (before_count, after_count)."""
    start_time = time.monotonic()
    check_inputs(in1, in2, out1, out2, low, high)
    starting_message(in1, in2, out1, out2, orientation, low, high)
    name_index: Dict[str, int] = {}
    ref_index: Dict[str, int] = {}
    files = load_alignments(in1, in2, name_index, ref_index)
    before_count = len(files[0]) + len(files[1])
    low_thr, high_thr, correct_orientation = get_insert_size_thresholds(
        files, orientation, low, high
    )
    after_count = filter_sams(
        in1, in2, out1, out2, files, low_thr, high_thr, correct_orientation
    )
    finished_message(start_time, before_count, after_count)
    return before_count, after_count


def check_inputs(in1, in2, out1, out2, low: float, high: float) -> None:
    """Reference: filter.rs:40-53."""
    if len({in1, in2, out1, out2}) != 4:
        quit_with_error("--in1, --in2, --out1 and --out2 must all have unique values")
    if low <= 0.0 or low >= 50.0:
        quit_with_error("--low must be greater than 0 and less than 50")
    if high <= 50.0 or high >= 100.0:
        quit_with_error("--high must be greater than 50 and less than 100")


def starting_message(in1, in2, out1, out2, orientation, low, high) -> None:
    log.section_header("Starting Polypolish-TPU filter")
    log.explanation(
        "This runs a pre-processing filter on SAM alignments before they "
        "are used to polish. It looks at each read pair and flags "
        "alignments that do not seem to be part of a concordant pair. This "
        "can improve the accuracy Polypolish, especially near the edges of "
        "repeats."
    )
    log.eprint(f"Polypolish-TPU version: v{__version__}")
    log.eprint()
    log.eprint("Input alignments:")
    log.eprint(f"  {in1}")
    log.eprint(f"  {in2}")
    log.eprint()
    log.eprint("Output alignments:")
    log.eprint(f"  {out1}")
    log.eprint(f"  {out2}")
    log.eprint()
    log.eprint("Settings:")
    log.eprint(f"  --orientation {orientation}")
    log.eprint(f"  --low {pairfilter._rust_f64_display(low)}")
    log.eprint(f"  --high {pairfilter._rust_f64_display(high)}")
    log.eprint()


def finished_message(start_time: float, before_count: int, after_count: int) -> None:
    log.section_header("Finished!")
    log.eprint(f"Alignments before filtering: {log.thousands(before_count)}")
    log.eprint(f"Alignments after filtering:  {log.thousands(after_count)}")
    log.eprint()
    log.eprint(f"Time to run: {format_duration(time.monotonic() - start_time)}")
    log.eprint()


def load_alignments(
    in1: str,
    in2: str,
    name_index: Dict[str, int],
    ref_index: Dict[str, int],
) -> Tuple[_FileAlignments, _FileAlignments]:
    """Reference: filter.rs:91-145."""
    log.section_header("Loading alignments")
    native = _load_native(in1, in2)
    if native is not None:
        log.eprint()
        return native
    files = (_FileAlignments(), _FileAlignments())
    for which, filename in ((0, in1), (1, in2)):
        _load_one_file(filename, files[which], name_index, ref_index)
        if len(files[0]) == 0 and len(files[1]) == 0:
            quit_with_error(f'no alignments found in "{filename}"')
    log.eprint()
    files[0].finalize()
    files[1].finalize()
    return files


def _load_native(in1: str, in2: str):
    """Native quick-parse path; returns None to fall back to the Python
    loader.  Gzipped SAM and BAM inputs are handled natively since
    round 4 (LoadedInput in sam_packer.cc)."""
    try:
        from polypolish_tpu.native import binding, loader

        if not loader.available():
            return None
    except OSError:
        return None
    parsed = binding.quick_parse_pair(in1, in2)
    files = []
    for filename, cols in zip((in1, in2), parsed):
        fa = _FileAlignments()
        fa.flags = cols["flags"]
        fa.ref_id = cols["ref_id"]
        fa.start = cols["start"]
        fa.end = cols["end"]
        fa.name_idx = cols["name_id"]
        fa.line_end = cols.get("line_end")
        files.append(fa)
        log.eprint(
            f"{filename}: {log.thousands(len(fa))} alignments from "
            f"{log.thousands(cols['n_names'])} reads"
        )
    if len(files[0]) == 0:
        quit_with_error(f'no alignments found in "{in1}"')
    return files[0], files[1]


def _load_one_file(
    filename: str,
    fa: _FileAlignments,
    name_index: Dict[str, int],
    ref_index: Dict[str, int],
) -> None:
    from polypolish_tpu.io.bam import open_sam_text

    try:
        f = open_sam_text(filename)
    except OSError:
        quit_with_error(f'unable to load alignments from "{filename}"')
    alignment_count = 0
    read_names = set()
    line_count = 0
    with f:
        for line in f:
            line_count += 1
            sam_line = line.rstrip("\n").rstrip("\r")
            if sam_line.startswith("@"):
                continue
            try:
                a = parse_alignment_quick(sam_line)
            except TooFewColumns:
                quit_with_error(
                    f'too few columns in "{filename}" (line {line_count})'
                )
            if not a.is_aligned():
                continue
            nidx = name_index.setdefault(a.read_name, len(name_index))
            ridx = ref_index.setdefault(a.ref_name, len(ref_index))
            fa.flags.append(a.sam_flags)
            fa.ref_id.append(ridx)
            fa.start.append(a.ref_start)
            fa.end.append(a.get_ref_end())
            fa.name_idx.append(nidx)
            read_names.add(a.read_name)
            alignment_count += 1
    log.eprint(
        f"{filename}: {log.thousands(alignment_count)} alignments from "
        f"{log.thousands(len(read_names))} reads"
    )


def get_insert_size_thresholds(
    files: Tuple[_FileAlignments, _FileAlignments],
    orientation: str,
    low_percentile: float,
    high_percentile: float,
) -> Tuple[int, int, int]:
    """Reference: filter.rs:148-186 (+221-246)."""
    log.section_header("Finding insert size thresholds")
    log.explanation(
        "Read pairs with exactly one alignment per read are used to "
        "determine the orientation and insert size thresholds for the "
        "read set."
    )
    f1, f2 = files
    # Vectorised unique-pair selection: reads with exactly one alignment
    # in each file, same reference (filter.rs:155-167).
    num_names = (
        int(
            max(
                f1.name_idx.max() if len(f1) else -1,
                f2.name_idx.max() if len(f2) else -1,
            )
        )
        + 1
    )
    c1 = np.bincount(f1.name_idx, minlength=num_names)
    c2 = np.bincount(f2.name_idx, minlength=num_names)
    row1 = np.full(num_names, -1, dtype=np.int64)
    row1[f1.name_idx[::-1]] = np.arange(len(f1))[::-1]
    row2 = np.full(num_names, -1, dtype=np.int64)
    row2[f2.name_idx[::-1]] = np.arange(len(f2))[::-1]
    unique = (c1 == 1) & (c2 == 1)
    r1 = row1[unique]
    r2 = row2[unique]
    same_ref = f1.ref_id[r1] == f2.ref_id[r2]
    r1, r2 = r1[same_ref], r2[same_ref]

    codes = pairfilter.orientation_vec(
        f1.flags[r1], f1.start[r1], f1.end[r1],
        f2.flags[r2], f2.start[r2], f2.end[r2],
    )
    sizes_all = pairfilter.insert_size_vec(
        f1.start[r1], f1.end[r1], f2.start[r2], f2.end[r2]
    )
    sizes_by_orientation = [sizes_all[codes == c] for c in range(4)]
    total_unique_pairs = int(r1.shape[0])
    if total_unique_pairs == 0:
        quit_with_error(
            "no one-alignment-per-read pairs available to determine "
            "orientation and insert size thresholds"
        )

    counts = [len(s) for s in sizes_by_orientation]
    for i, oname in enumerate(ORIENTATION_NAMES):
        log.eprint(f"{oname}: {log.thousands(counts[i])} pairs")
    if orientation == "auto":
        code = pairfilter.auto_determine_orientation(counts)
        log.eprint(
            f"\nAutomatically determined correct orientation: "
            f"{ORIENTATION_NAMES[code]}\n"
        )
    else:
        log.eprint(f"\nUser-specified correct orientation: {orientation}\n")
        # An unknown orientation string maps to code -1, which selects
        # an empty insert-size set below and dies with the reference's
        # own downstream fatal ("no read pairs available to determine
        # insert size thresholds").  This matches the reference exactly:
        # filter.rs:232-234 passes any string through and
        # filter.rs:174-176 errors on the empty vector that
        # insert_sizes.remove(<unknown>) yields.  Pinned by
        # tests/test_filter_e2e.py::test_filter_bad_orientation_string_fails.
        code = (
            ORIENTATION_NAMES.index(orientation)
            if orientation in ORIENTATION_NAMES
            else -1
        )

    sizes = (
        np.sort(np.asarray(sizes_by_orientation[code], dtype=np.int64),
                kind="stable")
        if code >= 0
        else np.empty(0, dtype=np.int64)
    )
    if sizes.size == 0:
        quit_with_error("no read pairs available to determine insert size thresholds")
    low_threshold = pairfilter.get_percentile(sizes, low_percentile)
    high_threshold = pairfilter.get_percentile(sizes, high_percentile)
    log.eprint(
        f"Low threshold:  {low_threshold} "
        f"({pairfilter.get_percentile_name(low_percentile)})"
    )
    log.eprint(
        f"High threshold: {high_threshold} "
        f"({pairfilter.get_percentile_name(high_percentile)})"
    )
    log.eprint()
    return low_threshold, high_threshold, code


def filter_sams(
    in1, in2, out1, out2, files, low: int, high: int, correct_orientation: int
) -> int:
    """Reference: filter.rs:273-349."""
    log.section_header("Filtering SAM files")
    log.explanation(
        "Read alignments that are part of a good pair (correct orientation "
        "and insert size) pass the filter and are written unaltered to the "
        'output file. Read alignments which are not part of good pair are '
        'written to the output file with a "ZP:Z:fail" tag so Polypolish '
        "will not use them."
    )
    # the two output rewrites are independent; the native re-stream
    # releases the GIL, so run them concurrently.  The stderr narrative
    # (Filtering <file>: / pass / fail) is printed after both complete,
    # in reference order.
    import concurrent.futures

    jobs = []
    for which, (in_f, out_f) in enumerate(((in1, out1), (in2, out2))):
        verdicts = compute_verdicts(files, which, low, high,
                                    correct_orientation)
        jobs.append((in_f, out_f, verdicts, files[which].line_end))
    after_count = 0
    with concurrent.futures.ThreadPoolExecutor(2) as pool:
        futures = [pool.submit(_rewrite_sam_quiet, i, o, v, le)
                   for i, o, v, le in jobs]
        results = [fut.result() for fut in futures]
    for (in_f, _o, _v, _le), (pass_count, fail_count) in zip(jobs, results):
        log.eprint(f"Filtering {in_f}:")
        log.eprint(f"  {log.thousands(pass_count)} pass")
        log.eprint(f"  {log.thousands(fail_count)} fail")
        log.eprint()
        after_count += pass_count
    return after_count


def compute_verdicts(
    files, which: int, low: int, high: int, correct_orientation: int
) -> np.ndarray:
    """Vectorised pass/fail for every aligned record of one file, in
    file order (reference pass rules: filter.rs:352-377)."""
    this, other = files[which], files[1 - which]
    n = len(this)
    if n == 0:
        return np.zeros(0, dtype=bool)

    num_names = int(max(this.name_idx.max() if n else 0,
                        other.name_idx.max() if len(other) else 0)) + 1

    this_count_by_name = np.bincount(this.name_idx, minlength=num_names)
    other_count_by_name = np.bincount(other.name_idx, minlength=num_names)

    # CSR of the other file's rows grouped by name.
    other_order = np.argsort(other.name_idx, kind="stable")
    other_offsets = np.zeros(num_names + 1, dtype=np.int64)
    np.cumsum(other_count_by_name, out=other_offsets[1:])

    reps = other_count_by_name[this.name_idx]  # pair count per alignment
    total = int(reps.sum())
    this_count = this_count_by_name[this.name_idx]

    verdict = (reps == 0) | (this_count == 1)
    need = ~verdict  # rows that require the pair-grid check
    if total > 0 and bool(need.any()):
        reps_need = np.where(need, reps, 0)
        seg = np.repeat(np.arange(n), reps_need)
        cum = np.concatenate(([0], np.cumsum(reps_need)))[:-1]
        flat_k = np.arange(int(reps_need.sum())) - np.repeat(cum, reps_need)
        pair_rows = other_order[
            other_offsets[this.name_idx[seg]] + flat_k
        ]
        if seg.size >= _JAX_GRID_THRESHOLD:
            # fully fused device step (grid mask + segment reduction)
            import jax.numpy as jnp

            from polypolish_tpu.models.pairscreen import pair_screen_step

            verdict = np.array(pair_screen_step(
                jnp.asarray(seg, jnp.int32),
                jnp.asarray(this.ref_id[seg], jnp.int32),
                jnp.asarray(this.flags[seg], jnp.int32),
                jnp.asarray(this.start[seg], jnp.int32),
                jnp.asarray(this.end[seg], jnp.int32),
                jnp.asarray(other.ref_id[pair_rows], jnp.int32),
                jnp.asarray(other.flags[pair_rows], jnp.int32),
                jnp.asarray(other.start[pair_rows], jnp.int32),
                jnp.asarray(other.end[pair_rows], jnp.int32),
                jnp.int32(low), jnp.int32(high),
                jnp.int32(correct_orientation),
                jnp.asarray(reps == 0), jnp.asarray(this_count == 1),
                num_alignments=n,
            ))
        else:
            good = pairfilter.good_pair_mask_numpy(
                this.ref_id[seg], this.flags[seg], this.start[seg],
                this.end[seg],
                other.ref_id[pair_rows], other.flags[pair_rows],
                other.start[pair_rows], other.end[pair_rows],
                low, high, correct_orientation,
            )
            has_good = pairfilter.segment_any(
                np.asarray(good, dtype=bool), seg, n
            )
            verdict |= has_good
    return verdict


def _rewrite_native(in_filename: str, out_filename: str,
                    verdicts: np.ndarray, line_end=None):
    """Native re-stream (plain-text OUTPUT only; gz/BAM inputs are
    materialised as SAM text natively since round 4); returns None to
    fall back to the Python line loop.  line_end (from the native
    quick-parse) makes the rewrite scan-free."""
    if str(out_filename).endswith(".gz"):
        return None
    try:
        from polypolish_tpu.native import binding, loader

        if not loader.available():
            return None
    except OSError:
        return None
    return binding.rewrite_sam_native(in_filename, out_filename, verdicts,
                                      line_end=line_end)


def _rewrite_sam_quiet(in_filename: str, out_filename: str,
                       verdicts: np.ndarray, line_end=None):
    """Re-stream one input, writing pass-through or ZP:Z:fail-tagged
    lines; returns (pass_count, fail_count) without stderr output
    (thread-safe half of _rewrite_sam)."""
    native_counts = _rewrite_native(in_filename, out_filename, verdicts,
                                    line_end)
    if native_counts is not None:
        return native_counts
    return _rewrite_python(in_filename, out_filename, verdicts)


def _rewrite_sam(in_filename: str, out_filename: str, verdicts: np.ndarray) -> int:
    """Re-stream one input with the reference's stderr narrative."""
    log.eprint(f"Filtering {in_filename}:")
    pass_count, fail_count = _rewrite_sam_quiet(
        in_filename, out_filename, verdicts
    )
    log.eprint(f"  {log.thousands(pass_count)} pass")
    log.eprint(f"  {log.thousands(fail_count)} fail")
    log.eprint()
    return pass_count


def _rewrite_python(in_filename: str, out_filename: str,
                    verdicts: np.ndarray):
    pass_count = 0
    fail_count = 0
    idx = 0
    from polypolish_tpu.io.bam import open_sam_text
    from polypolish_tpu.io.fasta import open_text_auto

    try:
        fin = open_sam_text(in_filename)
    except OSError:
        quit_with_error(f'unable to load alignments from "{in_filename}"')
    try:
        fout = open_text_auto(out_filename, "wt")
    except OSError:
        quit_with_error(f'unable to write alignments to "{out_filename}"')
    with fin, fout:
        for line in fin:
            sam_line = line.rstrip("\n").rstrip("\r")
            if sam_line.startswith("@"):
                fout.write(sam_line + "\n")
                continue
            # only the FLAG field is needed here; the first pass already
            # validated the full records
            parts = sam_line.split("\t", 2)
            if len(parts) < 3 or (int(parts[1]) & 4) != 0:
                fout.write(sam_line + "\n")
                continue
            if verdicts[idx]:
                fout.write(sam_line + "\n")
                pass_count += 1
            else:
                fout.write(sam_line + "\tZP:Z:fail\n")
                fail_count += 1
            idx += 1
    return pass_count, fail_count
