// ppref — single-threaded reference-replica polisher.
//
// Purpose: a MEASURED performance baseline and a differential oracle
// for the TPU framework.  The Rust toolchain is not available in this
// environment (BASELINE.md), so the reference binary (Polypolish
// v0.6.1) cannot be built; this program re-implements its `polish`
// subcommand with the *same algorithmic structure and per-record
// work* as the Rust source, so its single-core throughput is an honest
// stand-in for the reference's:
//
//   - line-by-line SAM streaming with per-group buffering of owned
//     per-alignment strings (alignment.rs:214-272: Vec<Alignment> with
//     String read_name/ref_name/cigar/expanded_cigar/read_seq fields)
//   - expanded one-char-per-op CIGAR string built at parse time
//     (alignment.rs:325-346) and re-walked per alignment into a
//     Vec<(start,end)> of read ranges (alignment.rs:175-201)
//   - homopolymer trim by substring comparison (alignment.rs:364-378)
//   - per-base PileupBase with u32 A/C/G/T counters + a hash map for
//     everything else, f64 depth accumulation (pileup.rs:29-65)
//   - per-base consensus allocating valid/intermediate string vectors
//     (pileup.rs:67-134), banker's rounding (misc.rs:204-215)
//   - polished sequence built base-by-base then '-'-stripped
//     (polish.rs:170-188)
//
// Where C++ and Rust idioms differ, the *faster* choice is taken (e.g.
// a reused getline buffer where Rust's lines() allocates per line), so
// the measured baseline errs on the fast side and any vs_baseline
// ratio computed against it is conservative.
//
// No code is copied from the reference (which is Rust); this file is
// written from its observed behavior, cited per function.
//
// Usage:
//   ppref polish [--debug FILE] [-i F] [-v F] [-m N] [-d N] [--careful]
//         assembly.fasta reads1.sam [reads2.sam ...] > polished.fasta
//
// stdout: polished FASTA (byte-compatible with the reference/framework)
// stderr: per-file alignment counts, per-contig stats, and a final
//         machine-readable line:
//         PPREF_TIMING total_s=... load_s=... align_s=... polish_s=...

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <string_view>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

[[noreturn]] void quit_with_error(const std::string& msg) {
  // misc.rs:29-33
  std::cerr << "Error: " << msg << "\n";
  std::exit(1);
}

// ---------------------------------------------------------------------
// misc.rs:204-215 — banker's rounding on positive f64 -> u32
// ---------------------------------------------------------------------
uint32_t bankers_rounding(double f) {
  uint32_t rounded_down = (uint32_t)f;
  double fract = f - std::trunc(f);
  if (fract < 0.5) return rounded_down;
  if (fract > 0.5) return rounded_down + 1;
  return rounded_down + (rounded_down & 1u);
}

// misc.rs:170-191 — IUPAC reverse complement
char kComp[256];
void init_comp() {
  for (int i = 0; i < 256; ++i) kComp[i] = 'N';
  const char* from = "ATGCatgcNnRYSWKMBVDHryswkmbvdh.-?";
  const char* to = "TACGtacgNnYRSWMKVBHDyrswmkvbhd.-?";
  for (size_t i = 0; from[i]; ++i) kComp[(unsigned char)from[i]] = to[i];
}
std::string reverse_complement(const std::string& s) {
  std::string out(s.size(), 0);
  for (size_t i = 0; i < s.size(); ++i)
    out[s.size() - 1 - i] = kComp[(unsigned char)s[i]];
  return out;
}

// ---------------------------------------------------------------------
// misc.rs:102-133 — FASTA loader (plain text; bench inputs are plain)
// ---------------------------------------------------------------------
struct FastaRecord {
  std::string name, description, sequence;
};

std::vector<FastaRecord> load_fasta(const std::string& filename) {
  std::ifstream f(filename);
  if (!f) quit_with_error("unable to load \"" + filename + "\"");
  {
    // misc.rs:81-99 gzip sniff: read_exact of the first two bytes
    // fails on a 0/1-byte file BEFORE any parsing ("is too small")
    char magic[2];
    if (!f.read(magic, 2))
      quit_with_error("\"" + filename + "\" is too small");
    f.clear();
    f.seekg(0);
  }
  std::vector<FastaRecord> out;
  std::string line, name, description, sequence;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty()) continue;
    if (line[0] == '>') {
      if (!name.empty()) {
        for (char& c : sequence) c = (char)std::toupper((unsigned char)c);
        out.push_back({name, description, sequence});
        sequence.clear();
      }
      size_t sp = line.find_first_of(" \t", 1);
      if (sp == std::string::npos) {
        name = line.substr(1);
        description.clear();
      } else {
        name = line.substr(1, sp - 1);
        description = line.substr(sp + 1);
      }
    } else {
      if (name.empty())
        quit_with_error("\"" + filename + "\" is not correctly formatted");
      sequence += line;
    }
  }
  if (!name.empty()) {
    for (char& c : sequence) c = (char)std::toupper((unsigned char)c);
    out.push_back({name, description, sequence});
  }
  // check_load_fasta (misc.rs:56-75)
  if (out.empty())
    quit_with_error("\"" + filename + "\" contains no sequences");
  std::unordered_set<std::string> names;
  for (auto& r : out) {
    if (r.name.empty())
      quit_with_error("\"" + filename + "\" has an unnamed sequence");
    if (r.sequence.empty())
      quit_with_error("\"" + filename + "\" has an empty sequence");
    if (!names.insert(r.name).second)
      quit_with_error("\"" + filename + "\" has a duplicated name");
  }
  return out;
}

// ---------------------------------------------------------------------
// pileup.rs:29-65 — per-base vote counters
// ---------------------------------------------------------------------
struct PileupBase {
  char original;
  double depth = 0.0;
  uint32_t count_a = 0, count_c = 0, count_g = 0, count_t = 0;
  std::unordered_map<std::string, uint32_t> counts;

  explicit PileupBase(char orig) : original(orig) {}

  void add_seq(std::string_view seq, double depth_contribution) {
    if (seq.size() == 1) {
      switch (seq[0]) {
        case 'A': ++count_a; depth += depth_contribution; return;
        case 'C': ++count_c; depth += depth_contribution; return;
        case 'G': ++count_g; depth += depth_contribution; return;
        case 'T': ++count_t; depth += depth_contribution; return;
        default: break;
      }
    }
    ++counts[std::string(seq)];
    depth += depth_contribution;
  }
};

enum class BaseStatus {
  DepthTooLow, NoValidOptions, MultipleValidOptions,
  TooClose, OriginalBaseKept, Changed,
};

const char* status_str(BaseStatus s) {
  switch (s) {
    case BaseStatus::OriginalBaseKept: return "kept";
    case BaseStatus::Changed: return "changed";
    case BaseStatus::DepthTooLow: return "low_depth";
    case BaseStatus::NoValidOptions: return "none";
    case BaseStatus::MultipleValidOptions: return "multiple";
    case BaseStatus::TooClose: return "too_close";
  }
  return "?";
}

// pileup.rs:67-134 — the consensus decision.  Mirrors the reference's
// per-base allocation pattern (string vectors of candidate seqs).
struct PolishResult {
  std::string new_base;
  BaseStatus status;
};

PolishResult get_polished_seq(const PileupBase& b, uint32_t min_depth,
                              double fraction_valid,
                              double fraction_invalid) {
  std::string original(1, b.original);
  uint32_t valid_threshold =
      std::max(min_depth, bankers_rounding(b.depth * fraction_valid));
  uint32_t invalid_threshold = bankers_rounding(b.depth * fraction_invalid);

  std::vector<std::string> valid_seqs, intermediate_seqs;
  // note: a zero count still enters the intermediate bucket when
  // invalid_threshold == 0 — exactly like the reference's >= compares
  auto bucket = [&](uint32_t count, const char* s) {
    if (count >= valid_threshold) valid_seqs.push_back(s);
    else if (count >= invalid_threshold) intermediate_seqs.push_back(s);
  };
  bucket(b.count_a, "A");
  bucket(b.count_c, "C");
  bucket(b.count_g, "G");
  bucket(b.count_t, "T");
  for (const auto& [seq, count] : b.counts) {
    if (count >= valid_threshold) valid_seqs.push_back(seq);
    else if (count >= invalid_threshold) intermediate_seqs.push_back(seq);
  }

  std::string new_base = original;
  BaseStatus status = BaseStatus::OriginalBaseKept;
  if (b.depth < (double)min_depth) {
    status = BaseStatus::DepthTooLow;
  } else if (valid_seqs.size() == 1) {
    if (!intermediate_seqs.empty()) {
      status = BaseStatus::TooClose;
    } else {
      new_base = valid_seqs[0];
      if (new_base != original) status = BaseStatus::Changed;
    }
  } else if (valid_seqs.empty()) {
    status = BaseStatus::NoValidOptions;
  } else {
    status = BaseStatus::MultipleValidOptions;
  }
  return {std::move(new_base), status};
}

// pileup.rs:137-148 — debug "pileup" column
std::string get_count_str(const PileupBase& b) {
  std::vector<std::string> entries;
  char buf[48];
  auto push = [&](const char* s, uint32_t c) {
    snprintf(buf, sizeof(buf), "%sx%u", s, c);
    entries.emplace_back(buf);
  };
  if (b.count_a > 0) push("A", b.count_a);
  if (b.count_c > 0) push("C", b.count_c);
  if (b.count_g > 0) push("G", b.count_g);
  if (b.count_t > 0) push("T", b.count_t);
  for (const auto& [seq, count] : b.counts) {
    snprintf(buf, sizeof(buf), "x%u", count);
    entries.push_back(seq + buf);
  }
  std::sort(entries.begin(), entries.end());
  std::string out;
  for (size_t i = 0; i < entries.size(); ++i) {
    if (i) out.push_back(',');
    out += entries[i];
  }
  return out;
}

using Pileup = std::vector<PileupBase>;

// ---------------------------------------------------------------------
// alignment.rs:32-211 — the alignment record
// ---------------------------------------------------------------------
struct Alignment {
  std::string read_name, ref_name, cigar, expanded_cigar, read_seq;
  uint32_t sam_flags = 0;
  size_t ref_start = 0;
  uint32_t mismatches = 0;
  bool pass_qc = true;

  bool is_aligned() const { return (sam_flags & 4) == 0; }
  int strand() const { return (sam_flags & 16) == 0 ? 1 : -1; }
};

uint64_t parse_uint(std::string_view s) {
  uint64_t v = 0;
  for (char c : s) {
    if (c < '0' || c > '9') break;
    v = v * 10 + (uint64_t)(c - '0');
  }
  return v;
}

// alignment.rs:330-346 — regex-equivalent tokenizer: non-overlapping
// \d+[MIDNSHP=X] matches; valid iff the matches cover the whole string.
bool get_expanded_cigar(std::string_view cigar, std::string* out) {
  out->clear();
  if (cigar == "*") return true;
  size_t total_len = 0;
  size_t i = 0;
  const size_t n = cigar.size();
  while (i < n) {
    if (cigar[i] >= '0' && cigar[i] <= '9') {
      size_t d = i;
      uint64_t num = 0;
      while (d < n && cigar[d] >= '0' && cigar[d] <= '9')
        num = num * 10 + (uint64_t)(cigar[d++] - '0');
      char op = (d < n) ? cigar[d] : 0;
      if (op == 'M' || op == 'I' || op == 'D' || op == 'N' || op == 'S' ||
          op == 'H' || op == 'P' || op == '=' || op == 'X') {
        out->append((size_t)num, op);
        total_len += (d - i) + 1;
        i = d + 1;
      } else {
        i = d;  // digit run not followed by an op: not a match
        if (i < n) ++i;
      }
    } else {
      ++i;
    }
  }
  return total_len == cigar.size();
}

// alignment.rs:49-98 — full parse of one SAM body line
// returns 1 ok, 0 "too few columns", -1 "missing NM tag"
int alignment_new(std::string_view line, Alignment* a) {
  std::string_view parts[512];
  int nf = 0;
  size_t start = 0;
  for (size_t i = 0; i <= line.size() && nf < 512; ++i) {
    if (i == line.size() || line[i] == '\t') {
      parts[nf++] = line.substr(start, i - start);
      start = i + 1;
    }
  }
  if (nf < 11) return 0;

  a->read_name.assign(parts[0]);
  a->sam_flags = (uint32_t)parse_uint(parts[1]);
  a->ref_name.assign(parts[2]);
  uint64_t rs = parse_uint(parts[3]);
  a->ref_start = (size_t)(rs > 0 ? rs - 1 : rs);
  a->cigar.assign(parts[5]);
  a->read_seq.assign(parts[9]);
  for (char& c : a->read_seq)
    if (c >= 'a' && c <= 'z') c = (char)(c - 32);  // to_ascii_uppercase

  a->mismatches = UINT32_MAX;
  a->pass_qc = true;
  for (int f = 11; f < nf; ++f) {
    std::string_view p = parts[f];
    if (p.size() >= 5 && p.substr(0, 5) == "NM:i:")
      a->mismatches = (uint32_t)parse_uint(p.substr(5));
    if (p.size() == 9) {
      static const char* zp = "ZP:Z:FAIL";
      bool eq = true;
      for (int k = 0; k < 9; ++k)
        if (std::toupper((unsigned char)p[(size_t)k]) != zp[k]) {
          eq = false;
          break;
        }
      if (eq) a->pass_qc = false;
    }
  }
  if (a->mismatches == UINT32_MAX && a->is_aligned()) return -1;
  if (!get_expanded_cigar(a->cigar, &a->expanded_cigar)) {
    quit_with_error("encountered an invalid CIGAR string for read " +
                    a->read_name + ": \"" + a->cigar + "\"");
  }
  return 1;
}

// alignment.rs:155-159
bool starts_and_ends_with_match(const Alignment& a) {
  if (a.expanded_cigar.empty()) quit_with_error("empty CIGAR");  // unwrap()
  char first = a.expanded_cigar.front();
  char last = a.expanded_cigar.back();
  return (first == 'M' || first == '=') && (last == 'M' || last == '=');
}

// alignment.rs:364-378
void trim_bases_for_homopolymers(std::vector<std::pair<size_t, size_t>>* rb,
                                 const std::string& read_seq) {
  auto [last_start, last_end] = rb->back();
  std::string_view last_base(read_seq.data() + last_start,
                             last_end - last_start);
  while (!rb->empty()) {
    auto [cs, ce] = rb->back();
    if (std::string_view(read_seq.data() + cs, ce - cs) != last_base) break;
    rb->pop_back();
  }
  if (!rb->empty()) rb->pop_back();
}

// alignment.rs:175-201
std::vector<std::pair<size_t, size_t>> get_read_bases_for_each_target_base(
    const Alignment& a) {
  size_t i = 0;
  std::vector<std::pair<size_t, size_t>> read_bases;
  read_bases.reserve(a.expanded_cigar.size());
  for (char c : a.expanded_cigar) {
    if (c == 'M' || c == '=' || c == 'X') {
      read_bases.emplace_back(i, i + 1);
      ++i;
    } else if (c == 'I') {
      read_bases.back().second = i + 1;
      ++i;
    } else if (c == 'D') {
      read_bases.emplace_back(i, i);
    } else {
      quit_with_error(
          "unexpected character (other than M, =, X, I or D) in CIGAR "
          "string for read " + a.read_name + ": \"" + a.cigar +
          "\" - did you use BWA MEM to generate your alignments?");
    }
  }
  if (i != a.read_seq.size()) {
    quit_with_error("CIGAR string for read " + a.read_name +
                    " does not match read sequence");
  }
  trim_bases_for_homopolymers(&read_bases, a.read_seq);
  return read_bases;
}

// pileup.rs:189-200
void add_alignment(Pileup& pileup, const Alignment& a,
                   double depth_contribution) {
  auto read_bases = get_read_bases_for_each_target_base(a);
  size_t i = a.ref_start;
  for (auto [start, end] : read_bases) {
    if (i >= pileup.size())
      quit_with_error("alignment past end of contig (reference panics)");
    if (start == end) {
      pileup[i].add_seq("-", depth_contribution);
    } else {
      pileup[i].add_seq(
          std::string_view(a.read_seq.data() + start, end - start),
          depth_contribution);
    }
    ++i;
  }
}

// alignment.rs:308-322
std::pair<std::string, int> get_read_seq_from_alignments(
    const std::vector<Alignment>& alignments) {
  for (const auto& a : alignments) {
    if (a.read_seq == "*") continue;
    return {a.read_seq, a.strand()};
  }
  quit_with_error("no alignments for read " + alignments.front().read_name +
                  " contain sequence");
}

// alignment.rs:275-305
size_t process_one_read(std::vector<Alignment>& alignments,
                        std::unordered_map<std::string, Pileup>& pileups,
                        uint32_t max_errors, bool careful) {
  // Deliberate divergence from the reference: on a SAM with zero
  // aligned records the Rust binary calls this with an empty vec
  // (alignment.rs:265) and PANICS at alignments.first().unwrap()
  // (alignment.rs:318-320) before ever reaching its own
  // "no alignments in" fatal (alignment.rs:268-270, dead code there).
  // We skip the empty group so the intended clean fatal is reached —
  // matching the framework.  Pinned by tests/test_fatal_parity.py.
  if (alignments.empty()) return 0;
  if (careful && alignments.size() > 1) return 0;
  auto [read_seq, strand] = get_read_seq_from_alignments(alignments);

  std::vector<Alignment> good;
  for (auto& a : alignments) {
    if (starts_and_ends_with_match(a) && a.mismatches <= max_errors &&
        a.pass_qc)
      good.push_back(std::move(a));
  }
  double depth_contribution = 1.0 / (double)good.size();

  for (auto& a : good) {
    if (a.read_seq == "*") {
      // alignment.rs:161-167
      a.read_seq =
          (a.strand() == strand) ? read_seq : reverse_complement(read_seq);
    }
  }
  for (const auto& a : good) {
    auto it = pileups.find(a.ref_name);
    if (it == pileups.end())
      quit_with_error("query name " + a.ref_name +
                      " in SAM but not in assembly");
    add_alignment(it->second, a, depth_contribution);
  }
  return good.size();
}

// alignment.rs:214-272
struct SamStats {
  size_t alignment_count = 0, used_count = 0, read_count = 0;
};

SamStats process_sam(const std::string& filename,
                     std::unordered_map<std::string, Pileup>& pileups,
                     uint32_t max_errors, bool careful) {
  std::ifstream f(filename);
  if (!f) quit_with_error("unable to load alignments from \"" + filename +
                          "\"");
  SamStats st;
  std::string line;
  std::string current_read_name;
  std::vector<Alignment> current;
  size_t line_count = 0;
  while (std::getline(f, line)) {
    ++line_count;
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty()) continue;
    if (line[0] == '@') continue;

    Alignment a;
    int rc = alignment_new(line, &a);
    if (rc == 0)
      quit_with_error("too few columns in \"" + filename + "\" (line " +
                      std::to_string(line_count) + ")");
    if (rc < 0)
      quit_with_error("missing NM tag in \"" + filename + "\" (line " +
                      std::to_string(line_count) + ")");
    if (!a.is_aligned()) continue;

    ++st.alignment_count;
    std::string read_name = a.read_name;
    if (current_read_name.empty() || current_read_name == a.read_name) {
      current.push_back(std::move(a));
    } else {
      st.used_count += process_one_read(current, pileups, max_errors, careful);
      ++st.read_count;
      current.clear();
      current.push_back(std::move(a));
    }
    current_read_name = std::move(read_name);
  }
  st.used_count += process_one_read(current, pileups, max_errors, careful);
  ++st.read_count;
  if (st.alignment_count == 0)
    quit_with_error("no alignments in \"" + filename + "\"");
  return st;
}

// ---------------------------------------------------------------------
// polish.rs:157-227 — per-contig polish + stats
// ---------------------------------------------------------------------
struct Timing {
  double load_s = 0, align_s = 0, polish_s = 0;
};

double now_s() {
  using namespace std::chrono;
  return duration<double>(steady_clock::now().time_since_epoch()).count();
}

size_t polish_one_sequence(const std::string& name,
                           const std::string& description,
                           const Pileup& pileup, double fraction_invalid,
                           double fraction_valid, uint32_t min_depth,
                           FILE* debug_file) {
  size_t seq_len = pileup.size();
  std::string polished_seq;
  polished_seq.reserve(seq_len);
  double total_depth = 0.0;
  size_t zero_depth_count = 0, changed_count = 0;
  size_t pos = 0;
  char numbuf[64];
  std::string debug_buf;
  for (const auto& b : pileup) {
    PolishResult r =
        get_polished_seq(b, min_depth, fraction_valid, fraction_invalid);
    if (r.status == BaseStatus::Changed) ++changed_count;
    total_depth += b.depth;
    if (b.depth == 0.0) ++zero_depth_count;
    if (debug_file) {
      // polish.rs:248,257-266 + pileup.rs:150-166
      uint32_t valid_threshold = std::max(
          min_depth, bankers_rounding(b.depth * fraction_valid));
      uint32_t invalid_threshold = bankers_rounding(b.depth * fraction_invalid);
      debug_buf.clear();
      debug_buf += name;
      snprintf(numbuf, sizeof(numbuf), "\t%zu\t%c\t%.1f\t%u\t%u\t", pos,
               b.original, b.depth, invalid_threshold, valid_threshold);
      debug_buf += numbuf;
      debug_buf += get_count_str(b);
      debug_buf.push_back('\t');
      debug_buf += status_str(r.status);
      debug_buf.push_back('\t');
      debug_buf += r.new_base;
      debug_buf.push_back('\n');
      fwrite(debug_buf.data(), 1, debug_buf.size(), debug_file);
    }
    polished_seq += r.new_base;
    ++pos;
  }
  // polish.rs:188 replace("-","")
  std::string stripped;
  stripped.reserve(polished_seq.size());
  for (char c : polished_seq)
    if (c != '-') stripped.push_back(c);
  polished_seq = std::move(stripped);

  // polish.rs:196-203
  fputc('>', stdout);
  fwrite(name.data(), 1, name.size(), stdout);
  if (!description.empty()) {
    fputc(' ', stdout);
    fwrite(description.data(), 1, description.size(), stdout);
  }
  fputs(" polypolish\n", stdout);
  fwrite(polished_seq.data(), 1, polished_seq.size(), stdout);
  fputc('\n', stdout);

  double seq_len_f = (double)seq_len;
  fprintf(stderr, "Polishing %s (%zu bp):\n", name.c_str(), seq_len);
  fprintf(stderr, "  mean read depth: %.1fx\n", total_depth / seq_len_f);
  fprintf(stderr, "  %zu bp have a depth of zero (%.4f%% coverage)\n",
          zero_depth_count,
          100.0 * (double)(seq_len - zero_depth_count) / seq_len_f);
  fprintf(stderr, "  %zu positions changed (%.4f%% of total positions)\n",
          changed_count, 100.0 * (double)changed_count / seq_len_f);
  return polished_seq.size();
}


// ---------------------------------------------------------------------
// filter subcommand (filter.rs:26-377): pre-screen paired SAMs by
// insert size + pair orientation, tagging discordant alignments
// ZP:Z:fail.  Same replica rules: mirror the Rust structure (per-line
// strings, HashMap<String, Vec<Alignment>> keyed by name+"_1"/"_2").
// ---------------------------------------------------------------------

struct QuickAln {
  std::string read_name, ref_name, cigar;
  uint32_t sam_flags = 0;
  size_t ref_start = 0;

  bool is_aligned() const { return (sam_flags & 4) == 0; }
  bool forward() const { return (sam_flags & 16) == 0; }

  // alignment.rs:138-149 — regex-equivalent: a maximal digit run counts
  // only when immediately followed by a valid CIGAR op letter.
  size_t ref_end() const {
    size_t end = ref_start;
    size_t i = 0;
    const size_t n = cigar.size();
    auto is_op = [](char c) {
      return c == 'M' || c == 'I' || c == 'D' || c == 'N' || c == 'S' ||
             c == 'H' || c == 'P' || c == '=' || c == 'X';
    };
    while (i < n) {
      if (cigar[i] >= '0' && cigar[i] <= '9') {
        uint64_t num = 0;
        size_t d = i;
        while (d < n && cigar[d] >= '0' && cigar[d] <= '9')
          num = num * 10 + (uint64_t)(cigar[d++] - '0');
        if (d < n && is_op(cigar[d])) {
          char op = cigar[d];
          if (op == 'M' || op == 'D' || op == 'N' || op == '=' ||
              op == 'X')
            end += (size_t)num;
          i = d + 1;
        } else {
          i = d + 1;
        }
      } else {
        ++i;
      }
    }
    return end;
  }
};

// alignment.rs:102-128 (new_quick)
bool quick_parse(std::string_view line, QuickAln* a) {
  std::string_view parts[16];
  int nf = 0;
  size_t start = 0;
  for (size_t i = 0; i <= line.size() && nf < 16; ++i) {
    if (i == line.size() || line[i] == '\t') {
      parts[nf++] = line.substr(start, i - start);
      start = i + 1;
    }
  }
  if (nf < 11) return false;
  a->read_name.assign(parts[0]);
  a->sam_flags = (uint32_t)parse_uint(parts[1]);
  a->ref_name.assign(parts[2]);
  uint64_t rs = parse_uint(parts[3]);
  a->ref_start = (size_t)(rs > 0 ? rs - 1 : rs);
  a->cigar.assign(parts[5]);
  return true;
}

// filter.rs:189-209
std::string get_orientation(const QuickAln& a1, const QuickAln& a2) {
  char s1 = a1.forward() ? 'f' : 'r';
  char s2 = a2.forward() ? 'f' : 'r';
  size_t p1 = a1.forward() ? a1.ref_start : a1.ref_end();
  size_t p2 = a2.forward() ? a2.ref_start : a2.ref_end();
  if (s1 != s2) {
    if (p1 < p2) return std::string{s1, s2};
    return std::string{s2, s1};
  }
  if (s1 == 'f') return p1 < p2 ? "ff" : "rr";
  return p2 < p1 ? "ff" : "rr";
}

// filter.rs:212-218
uint32_t get_insert_size(const QuickAln& a1, const QuickAln& a2) {
  size_t pts[4] = {a1.ref_start, a1.ref_end(), a2.ref_start, a2.ref_end()};
  size_t lo = pts[0], hi = pts[0];
  for (size_t p : pts) {
    lo = std::min(lo, p);
    hi = std::max(hi, p);
  }
  return (uint32_t)(hi - lo);
}

// filter.rs:249-259 (nearest rank on a sorted list)
uint32_t get_percentile(const std::vector<uint32_t>& sorted, double pct) {
  if (sorted.empty()) return 0;
  double fraction = pct / 100.0;
  double r = std::ceil(fraction * (double)sorted.size());
  size_t rank = r < 1.0 ? 1 : (size_t)r;
  if (rank < 1) rank = 1;
  if (rank > sorted.size()) return 0;
  return sorted[rank - 1];
}

// filter.rs:352-377
bool alignment_pass_qc(const QuickAln& a,
                       const std::vector<QuickAln>& this_alns,
                       const std::vector<QuickAln>& pair_alns,
                       uint32_t low, uint32_t high,
                       const std::string& correct_orientation) {
  if (pair_alns.empty()) return true;
  if (this_alns.size() == 1) return true;
  for (const auto& pa : pair_alns) {
    bool same_ref = a.ref_name == pa.ref_name;
    uint32_t insert = get_insert_size(a, pa);
    std::string orientation = get_orientation(a, pa);
    if (same_ref && low <= insert && insert <= high &&
        orientation == correct_orientation)
      return true;
  }
  return false;
}

using AlnMap = std::unordered_map<std::string, std::vector<QuickAln>>;

// filter.rs:110-145
void filter_load_one(const std::string& filename, AlnMap& alignments,
                     const char* suffix) {
  std::ifstream f(filename);
  if (!f)
    quit_with_error("unable to load alignments from \"" + filename + "\"");
  std::string line;
  size_t line_count = 0;
  size_t alignment_count = 0;
  while (std::getline(f, line)) {
    ++line_count;
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (!line.empty() && line[0] == '@') continue;
    QuickAln a;
    if (!quick_parse(line, &a))
      quit_with_error("too few columns in \"" + filename + "\" (line " +
                      std::to_string(line_count) + ")");
    if (!a.is_aligned()) continue;
    a.read_name += suffix;
    alignments[a.read_name].push_back(std::move(a));
    ++alignment_count;
  }
  if (alignments.empty())
    quit_with_error("no alignments found in \"" + filename + "\"");
  fprintf(stderr, "%s: %zu alignments\n", filename.c_str(),
          alignment_count);
}

// filter.rs:296-349
size_t filter_one_sam(const std::string& in_path,
                      const std::string& out_path, const AlnMap& alignments,
                      uint32_t low, uint32_t high,
                      const std::string& correct_orientation, int read_num) {
  std::ifstream f(in_path);
  if (!f)
    quit_with_error("unable to load alignments from \"" + in_path + "\"");
  FILE* out = fopen(out_path.c_str(), "wb");
  if (!out)
    quit_with_error("unable to write alignments to \"" + out_path + "\"");
  static const std::vector<QuickAln> kNone;
  std::string line;
  size_t pass_count = 0, fail_count = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (!line.empty() && line[0] == '@') {
      fwrite(line.data(), 1, line.size(), out);
      fputc('\n', out);
      continue;
    }
    QuickAln a;
    quick_parse(line, &a);
    if (!a.is_aligned()) {
      fwrite(line.data(), 1, line.size(), out);
      fputc('\n', out);
      continue;
    }
    std::string this_name = a.read_name + (read_num == 1 ? "_1" : "_2");
    std::string pair_name = a.read_name + (read_num == 1 ? "_2" : "_1");
    auto it = alignments.find(this_name);
    const std::vector<QuickAln>& this_alns =
        it != alignments.end() ? it->second : kNone;
    auto pit = alignments.find(pair_name);
    const std::vector<QuickAln>& pair_alns =
        pit != alignments.end() ? pit->second : kNone;
    if (alignment_pass_qc(a, this_alns, pair_alns, low, high,
                          correct_orientation)) {
      fwrite(line.data(), 1, line.size(), out);
      fputc('\n', out);
      ++pass_count;
    } else {
      fwrite(line.data(), 1, line.size(), out);
      fwrite("\tZP:Z:fail", 1, 10, out);
      fputc('\n', out);
      ++fail_count;
    }
  }
  fclose(out);
  fprintf(stderr, "  %zu pass / %zu fail\n", pass_count, fail_count);
  return pass_count;
}

int main_filter(int argc, char** argv) {
  std::string in1, in2, out1, out2, orientation = "auto";
  double low = 0.1, high = 99.9;
  for (int i = 2; i < argc; ++i) {
    std::string_view a = argv[i];
    if (a == "--in1" && i + 1 < argc) in1 = argv[++i];
    else if (a == "--in2" && i + 1 < argc) in2 = argv[++i];
    else if (a == "--out1" && i + 1 < argc) out1 = argv[++i];
    else if (a == "--out2" && i + 1 < argc) out2 = argv[++i];
    else if (a == "--orientation" && i + 1 < argc) orientation = argv[++i];
    else if (a == "--low" && i + 1 < argc) low = atof(argv[++i]);
    else if (a == "--high" && i + 1 < argc) high = atof(argv[++i]);
  }
  if (in1.empty() || in2.empty() || out1.empty() || out2.empty()) {
    fprintf(stderr, "ppref filter: --in1/--in2/--out1/--out2 required\n");
    return 2;
  }
  double t0 = now_s();
  AlnMap alignments;
  filter_load_one(in1, alignments, "_1");
  filter_load_one(in2, alignments, "_2");

  // thresholds from unique-unique same-ref pairs (filter.rs:148-186)
  std::unordered_map<std::string, std::vector<uint32_t>> insert_sizes;
  for (const auto& kv : alignments) {
    const std::string& name1 = kv.first;
    const auto& alns1 = kv.second;
    if (name1.size() < 2 || name1.compare(name1.size() - 2, 2, "_1") != 0)
      continue;
    if (alns1.size() != 1) continue;
    std::string name2 = name1.substr(0, name1.size() - 2) + "_2";
    auto it = alignments.find(name2);
    if (it == alignments.end()) continue;
    const auto& alns2 = it->second;
    if (alns2.size() != 1 || alns1[0].ref_name != alns2[0].ref_name)
      continue;
    insert_sizes[get_orientation(alns1[0], alns2[0])].push_back(
        get_insert_size(alns1[0], alns2[0]));
  }
  if (insert_sizes.empty())
    quit_with_error(
        "no one-alignment-per-read pairs available to determine "
        "orientation and insert size thresholds");
  std::string correct = orientation;
  if (orientation == "auto") {
    size_t max_count = 0;
    for (auto& kv : insert_sizes)
      max_count = std::max(max_count, kv.second.size());
    std::vector<std::string> winners;
    for (const char* o : {"fr", "rf", "ff", "rr"}) {
      auto it = insert_sizes.find(o);
      size_t c = it == insert_sizes.end() ? 0 : it->second.size();
      if (c == max_count) winners.push_back(o);
    }
    if (winners.size() != 1)
      quit_with_error(
          "could not automatically determine read pair orientation");
    correct = winners[0];
  }
  std::vector<uint32_t> sizes;
  auto sit = insert_sizes.find(correct);
  if (sit != insert_sizes.end()) sizes = sit->second;
  if (sizes.empty())
    quit_with_error(
        "no read pairs available to determine insert size thresholds");
  std::sort(sizes.begin(), sizes.end());
  uint32_t low_thr = get_percentile(sizes, low);
  uint32_t high_thr = get_percentile(sizes, high);
  fprintf(stderr, "orientation %s, thresholds %u..%u\n", correct.c_str(),
          low_thr, high_thr);

  filter_one_sam(in1, out1, alignments, low_thr, high_thr, correct, 1);
  filter_one_sam(in2, out2, alignments, low_thr, high_thr, correct, 2);
  fprintf(stderr, "PPREF_TIMING total_s=%.6f\n", now_s() - t0);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  init_comp();
  if (argc >= 2 && std::string_view(argv[1]) == "filter") {
    return main_filter(argc, argv);
  }
  if (argc < 2 || std::string_view(argv[1]) != "polish") {
    fprintf(stderr,
            "usage: ppref polish [--debug FILE] [-i F] [-v F] [-m N] [-d N] "
            "[--careful] assembly.fasta reads.sam [reads2.sam ...]\n");
    return 2;
  }
  double fraction_invalid = 0.2, fraction_valid = 0.5;
  uint32_t max_errors = 10, min_depth = 5;
  bool careful = false;
  const char* debug_path = nullptr;
  std::vector<std::string> positional;
  for (int i = 2; i < argc; ++i) {
    std::string_view a = argv[i];
    if (a == "--debug" && i + 1 < argc) debug_path = argv[++i];
    else if (a == "-i" && i + 1 < argc) fraction_invalid = atof(argv[++i]);
    else if (a == "-v" && i + 1 < argc) fraction_valid = atof(argv[++i]);
    else if (a == "-m" && i + 1 < argc)
      max_errors = (uint32_t)atoi(argv[++i]);
    else if (a == "-d" && i + 1 < argc)
      min_depth = (uint32_t)atoi(argv[++i]);
    else if (a == "--careful") careful = true;
    else positional.emplace_back(a);
  }
  if (positional.size() < 2) {
    fprintf(stderr, "ppref: need an assembly and at least one SAM\n");
    return 2;
  }

  double t0 = now_s();
  auto fasta = load_fasta(positional[0]);
  std::vector<std::pair<std::string, std::string>> seq_names;
  std::unordered_map<std::string, Pileup> pileups;
  for (auto& r : fasta) {
    seq_names.emplace_back(r.name, r.description);
    Pileup p;
    p.reserve(r.sequence.size());
    for (char c : r.sequence) p.emplace_back(c);
    pileups.emplace(r.name, std::move(p));
  }
  double t1 = now_s();

  for (size_t s = 1; s < positional.size(); ++s) {
    SamStats st = process_sam(positional[s], pileups, max_errors, careful);
    fprintf(stderr, "%s: %zu alignments from %zu reads (%zu used)\n",
            positional[s].c_str(), st.alignment_count, st.read_count,
            st.used_count);
  }
  double t2 = now_s();

  FILE* debug_file = nullptr;
  if (debug_path) {
    debug_file = fopen(debug_path, "wb");
    if (!debug_file)
      quit_with_error(std::string("unable to create \"") + debug_path + "\"");
    fputs("name\tpos\tbase\tdepth\tinvalid\tvalid\tpileup\tstatus\tnew_base\n",
          debug_file);
  }
  for (auto& [name, description] : seq_names) {
    polish_one_sequence(name, description, pileups.at(name), fraction_invalid,
                        fraction_valid, min_depth, debug_file);
  }
  if (debug_file) fclose(debug_file);
  fflush(stdout);
  double t3 = now_s();
  fprintf(stderr,
          "PPREF_TIMING total_s=%.6f load_s=%.6f align_s=%.6f polish_s=%.6f\n",
          t3 - t0, t1 - t0, t2 - t1, t3 - t2);
  return 0;
}
