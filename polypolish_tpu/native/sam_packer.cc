// Native SAM packer: streaming SAM text -> packed vote-event arrays.
//
// The host half of the polish pipeline (read grouping, QC, CIGAR walk,
// homopolymer trim, vocab interning) implemented in C++ for throughput;
// contract-identical to the pure-Python packer in ops/pack.py (see the
// cross-check in tests/test_native.py).  Reference semantics:
// alignment.rs:214-322, pileup.rs:189-200.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Result {
  std::vector<int32_t> contig_id;
  std::vector<int32_t> pos;
  std::vector<int32_t> vocab;
  std::vector<double> weight;
  std::string new_vocab;      // '\n'-joined strings for ids >= n_vocab_in
  int64_t n_new_vocab = 0;
  int64_t alignment_count = 0;
  int64_t used_count = 0;
  int64_t read_count = 0;
  int status = 0;             // 0 ok, 1 fatal (message in error)
  std::string error;
};

struct Aln {
  std::string_view read_name;
  std::string_view ref_name;
  std::string_view cigar;
  std::string_view seq_raw;   // raw SEQ field (may be "*")
  std::string seq_owned;      // filled/uppercased sequence when needed
  uint32_t flags = 0;
  int64_t ref_start = 0;
  int64_t mismatches = -1;    // -1 = missing NM
  bool pass_qc = true;
  bool good = false;

  bool aligned() const { return (flags & 4) == 0; }
  bool forward() const { return (flags & 16) == 0; }
};

char kRevComp[256];
char kUpper[256];

void init_tables() {
  for (int i = 0; i < 256; ++i) kRevComp[i] = 'N';
  const char* from = "ATGCatgcNnRYSWKMBVDHryswkmbvdh.-?";
  const char* to = "TACGtacgNnYRSWMKVBHDyrswmkvbhd.-?";
  for (size_t i = 0; from[i]; ++i)
    kRevComp[(unsigned char)from[i]] = to[i];
  for (int i = 0; i < 256; ++i)
    kUpper[i] = (i >= 'a' && i <= 'z') ? (char)(i - 32) : (char)i;
}

inline void ascii_upper_inplace(std::string& s) {
  for (char& c : s) c = kUpper[(unsigned char)c];
}

// locale-free integer parse on a string_view (digits only, like the
// reference's unwrap()ing parse — garbage-in is undefined there too)
inline int64_t parse_int(std::string_view s) {
  int64_t v = 0;
  for (char c : s) {
    if (c < '0' || c > '9') break;
    v = v * 10 + (c - '0');
  }
  return v;
}

std::string revcomp_str(const std::string& s) {
  std::string out(s.size(), 0);
  for (size_t i = 0; i < s.size(); ++i)
    out[s.size() - 1 - i] = kRevComp[(unsigned char)s[i]];
  return out;
}

// CIGAR op -> category
inline bool is_cigar_op(char c) {
  return c == 'M' || c == 'I' || c == 'D' || c == 'N' || c == 'S' ||
         c == 'H' || c == 'P' || c == '=' || c == 'X';
}

// Validate a CIGAR the same way the reference regex pass does
// (alignment.rs:325-346): the token stream (\d+[MIDNSHP=X])* must cover
// the whole string.  "*" is valid (empty).
bool cigar_valid(std::string_view cigar) {
  if (cigar == "*") return true;
  size_t i = 0;
  const size_t n = cigar.size();
  while (i < n) {
    size_t d = i;
    while (d < n && cigar[d] >= '0' && cigar[d] <= '9') ++d;
    if (d == i) return false;          // must start with digits
    if (d >= n || !is_cigar_op(cigar[d])) return false;
    i = d + 1;
  }
  return n > 0;
}

// First/last op letters (end-to-end check needs them; alignment.rs:155-159)
bool starts_and_ends_with_match(std::string_view cigar) {
  if (cigar == "*" || cigar.empty()) return false;
  char last = cigar.back();
  // find first op letter
  size_t i = 0;
  while (i < cigar.size() && cigar[i] >= '0' && cigar[i] <= '9') ++i;
  if (i >= cigar.size()) return false;
  char first = cigar[i];
  return (first == 'M' || first == '=') && (last == 'M' || last == '=');
}

struct Interner {
  std::unordered_map<std::string, int32_t> map;
  int32_t next_id;
  int32_t char_ids[256];
  std::string* new_vocab;
  int64_t* n_new_vocab;

  int32_t intern(const std::string& s) {
    if (s.size() == 1) {
      int32_t v = char_ids[(unsigned char)s[0]];
      if (v >= 0) return v;
    }
    auto it = map.find(s);
    if (it != map.end()) return it->second;
    int32_t id = next_id++;
    map.emplace(s, id);
    if (s.size() == 1) char_ids[(unsigned char)s[0]] = id;
    new_vocab->append(s);
    new_vocab->push_back('\n');
    ++*n_new_vocab;
    return id;
  }
};

struct Context {
  Result* res;
  Interner interner;
  std::unordered_map<std::string_view, int32_t> contig_ids;
  const int64_t* contig_lens;
  int64_t max_errors;
  bool careful;
  std::string filename;
  std::string contig_buf;  // backing storage for contig name views
  std::string vocab_buf;
};

bool fail(Context& ctx, const std::string& msg) {
  ctx.res->status = 1;
  ctx.res->error = msg;
  return false;
}

// Process one read group (consecutive SAM lines with the same name).
// Reference: alignment.rs:275-305.
bool process_group(Context& ctx, std::vector<Aln>& group) {
  Result& res = *ctx.res;
  if (ctx.careful && group.size() > 1) return true;

  // recover the read sequence from the first non-'*' alignment
  const Aln* primary = nullptr;
  for (const Aln& a : group) {
    if (a.seq_raw != "*") { primary = &a; break; }
  }
  if (!primary) {
    return fail(ctx, "no alignments for read " +
                         std::string(group[0].read_name) +
                         " contain sequence");
  }
  std::string primary_seq(primary->seq_raw);
  ascii_upper_inplace(primary_seq);
  bool primary_fwd = primary->forward();

  int n_good = 0;
  for (Aln& a : group) {
    a.good = starts_and_ends_with_match(a.cigar) &&
             a.mismatches <= ctx.max_errors && a.pass_qc;
    if (a.good) ++n_good;
  }
  if (n_good == 0) return true;
  double w = 1.0 / (double)n_good;
  res.used_count += n_good;

  std::vector<std::pair<int32_t, int32_t>> ranges;
  for (Aln& a : group) {
    if (!a.good) continue;
    if (a.seq_raw == "*") {
      a.seq_owned = (a.forward() == primary_fwd) ? primary_seq
                                                 : revcomp_str(primary_seq);
    } else {
      a.seq_owned.assign(a.seq_raw);
      ascii_upper_inplace(a.seq_owned);
    }
    const std::string& seq = a.seq_owned;

    auto cit = ctx.contig_ids.find(a.ref_name);
    if (cit == ctx.contig_ids.end()) {
      return fail(ctx, "query name " + std::string(a.ref_name) +
                           " in SAM but not in assembly");
    }
    int32_t contig = cit->second;

    // CIGAR walk -> per-target-position read ranges (alignment.rs:175-198)
    ranges.clear();
    int32_t i = 0;
    const std::string_view cig = a.cigar;
    size_t p = 0;
    while (p < cig.size()) {
      int64_t num = 0;
      while (p < cig.size() && cig[p] >= '0' && cig[p] <= '9')
        num = num * 10 + (cig[p++] - '0');
      char op = cig[p++];
      switch (op) {
        case 'M': case '=': case 'X':
          for (int64_t k = 0; k < num; ++k) {
            ranges.emplace_back(i, i + 1);
            ++i;
          }
          break;
        case 'I':
          // first op is M/= (end-to-end filter), so ranges is non-empty
          ranges.back().second = i + (int32_t)num;
          i += (int32_t)num;
          break;
        case 'D':
          for (int64_t k = 0; k < num; ++k) ranges.emplace_back(i, i);
          break;
        default:
          return fail(ctx,
                      "unexpected character (other than M, =, X, I or D) in "
                      "CIGAR string for read " + std::string(a.read_name) +
                      ": \"" + std::string(cig) +
                      "\" - did you use BWA MEM to generate your alignments?");
      }
    }
    if ((size_t)i != seq.size()) {
      return fail(ctx, "CIGAR string for read " + std::string(a.read_name) +
                           " does not match read sequence");
    }

    // homopolymer trim (alignment.rs:364-378)
    {
      auto [ls, le] = ranges.back();
      std::string_view last(seq.data() + ls, (size_t)(le - ls));
      while (!ranges.empty()) {
        auto [cs, ce] = ranges.back();
        if (std::string_view(seq.data() + cs, (size_t)(ce - cs)) != last)
          break;
        ranges.pop_back();
      }
      if (!ranges.empty()) ranges.pop_back();
    }
    if (ranges.empty()) continue;

    int64_t end_pos = a.ref_start + (int64_t)ranges.size();
    if (end_pos > ctx.contig_lens[contig]) {
      return fail(ctx, "alignment for read " + std::string(a.read_name) +
                           " extends past the end of contig " +
                           std::string(a.ref_name));
    }

    int64_t pos = a.ref_start;
    for (const auto& [s, e] : ranges) {
      int32_t vid;
      if (s == e) {
        vid = 0;  // '-' deletion vote
      } else if (e - s == 1) {
        vid = ctx.interner.char_ids[(unsigned char)seq[(size_t)s]];
        if (vid < 0) vid = ctx.interner.intern(std::string(1, seq[(size_t)s]));
      } else {
        vid = ctx.interner.intern(seq.substr((size_t)s, (size_t)(e - s)));
      }
      res.contig_id.push_back(contig);
      res.pos.push_back((int32_t)pos);
      res.vocab.push_back(vid);
      res.weight.push_back(w);
      ++pos;
    }
  }
  return true;
}

bool parse_line(Context& ctx, const char* line, size_t len, int64_t line_no,
                Aln& a) {
  // split into up to 12+ tab fields (in place, zero copy)
  const char* fields[64];
  size_t flens[64];
  int nf = 0;
  const char* start = line;
  const char* end = line + len;
  for (const char* q = line; q <= end && nf < 64; ++q) {
    if (q == end || *q == '\t') {
      fields[nf] = start;
      flens[nf] = (size_t)(q - start);
      ++nf;
      start = q + 1;
    }
  }
  if (nf < 11) {
    return fail(ctx, "too few columns in \"" + ctx.filename + "\" (line " +
                         std::to_string(line_no) + ")");
  }
  a.read_name = std::string_view(fields[0], flens[0]);
  a.flags = (uint32_t)parse_int(std::string_view(fields[1], flens[1]));
  a.ref_name = std::string_view(fields[2], flens[2]);
  int64_t rs = parse_int(std::string_view(fields[3], flens[3]));
  a.ref_start = rs > 0 ? rs - 1 : rs;
  a.cigar = std::string_view(fields[5], flens[5]);
  a.seq_raw = std::string_view(fields[9], flens[9]);
  a.mismatches = -1;
  a.pass_qc = true;
  for (int f = 11; f < nf; ++f) {
    std::string_view tag(fields[f], flens[f]);
    if (tag.size() >= 5 && tag.substr(0, 5) == "NM:i:") {
      a.mismatches = parse_int(tag.substr(5));
    }
    if (tag.size() == 9) {
      static const char* zp = "zp:z:fail";
      bool eq = true;
      for (int k = 0; k < 9; ++k)
        if (kUpper[(unsigned char)tag[(size_t)k]] != kUpper[(unsigned char)zp[k]]) {
          eq = false;
          break;
        }
      if (eq) a.pass_qc = false;
    }
  }
  if (a.mismatches < 0 && a.aligned()) {
    return fail(ctx, "missing NM tag in \"" + ctx.filename + "\" (line " +
                         std::to_string(line_no) + ")");
  }
  if (!cigar_valid(a.cigar)) {
    return fail(ctx, "encountered an invalid CIGAR string for read " +
                         std::string(a.read_name) + ": \"" +
                         std::string(a.cigar) + "\"");
  }
  return true;
}

void run_file(Context& ctx) {
  Result* res = ctx.res;
  FILE* f = fopen(ctx.filename.c_str(), "rb");
  if (!f) {
    fail(ctx, "unable to load alignments from \"" + ctx.filename + "\"");
    return;
  }
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string data;
  data.resize((size_t)fsize);
  if (fsize > 0 && fread(data.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
    fail(ctx, "unable to load alignments from \"" + ctx.filename + "\"");
    fclose(f);
    return;
  }
  fclose(f);

  // rough event capacity: ~1 event per 2.5 input bytes at typical
  // read lengths; avoids repeated reallocation of the output vectors
  size_t cap = data.size() / 3 + 1024;
  res->contig_id.reserve(cap);
  res->pos.reserve(cap);
  res->vocab.reserve(cap);
  res->weight.reserve(cap);

  std::vector<Aln> group;
  std::string_view current_name;
  int64_t line_no = 0;
  size_t off = 0;
  while (off < data.size()) {
    size_t nl = data.find('\n', off);
    if (nl == std::string::npos) nl = data.size();
    size_t llen = nl - off;
    if (llen > 0 && data[off + llen - 1] == '\r') --llen;
    ++line_no;
    const char* line = data.data() + off;
    off = nl + 1;
    if (llen == 0) continue;
    if (line[0] == '@') continue;

    Aln a;
    if (!parse_line(ctx, line, llen, line_no, a)) return;
    if (!a.aligned()) continue;
    ++res->alignment_count;

    if (current_name.empty() || current_name == a.read_name) {
      current_name = a.read_name;
      group.push_back(std::move(a));
    } else {
      if (!process_group(ctx, group)) return;
      ++res->read_count;
      group.clear();
      current_name = a.read_name;
      group.push_back(std::move(a));
    }
  }
  if (!group.empty()) {
    if (!process_group(ctx, group)) return;
    ++res->read_count;
  }
  if (res->alignment_count == 0) {
    fail(ctx, "no alignments in \"" + ctx.filename + "\"");
  }
}

}  // namespace

extern "C" {

struct PPResultView {
  const int32_t* contig_id;
  const int32_t* pos;
  const int32_t* vocab;
  const double* weight;
  int64_t n_events;
  const char* new_vocab;
  int64_t new_vocab_len;
  int64_t n_new_vocab;
  int64_t alignment_count;
  int64_t used_count;
  int64_t read_count;
  int status;
  const char* error;
  void* handle;
};

// contig_names / vocab_strs: '\n'-joined lists.
PPResultView* pp_process_sam(const char* filename, const char* contig_names,
                             const int64_t* contig_lens, int64_t n_contigs,
                             const char* vocab_strs, int64_t n_vocab,
                             int64_t max_errors, int32_t careful) {
  init_tables();
  auto* res = new Result();
  auto* view = new PPResultView();
  memset(view, 0, sizeof(*view));
  view->handle = res;

  Context ctx;
  ctx.res = res;
  ctx.contig_lens = contig_lens;
  ctx.max_errors = max_errors;
  ctx.careful = careful != 0;
  ctx.filename = filename;
  ctx.interner.new_vocab = &res->new_vocab;
  ctx.interner.n_new_vocab = &res->n_new_vocab;
  ctx.interner.next_id = (int32_t)n_vocab;
  for (int i = 0; i < 256; ++i) ctx.interner.char_ids[i] = -1;

  // contig table (names are backed by a persistent copy in ctx)
  ctx.contig_buf.assign(contig_names);
  {
    size_t start = 0;
    int32_t idx = 0;
    while (idx < n_contigs && start <= ctx.contig_buf.size()) {
      size_t nl = ctx.contig_buf.find('\n', start);
      if (nl == std::string::npos) nl = ctx.contig_buf.size();
      ctx.contig_ids.emplace(
          std::string_view(ctx.contig_buf.data() + start, nl - start), idx);
      start = nl + 1;
      ++idx;
    }
  }
  // vocab table
  ctx.vocab_buf.assign(vocab_strs);
  {
    size_t start = 0;
    int32_t idx = 0;
    while (idx < n_vocab && start <= ctx.vocab_buf.size()) {
      size_t nl = ctx.vocab_buf.find('\n', start);
      if (nl == std::string::npos) nl = ctx.vocab_buf.size();
      std::string s = ctx.vocab_buf.substr(start, nl - start);
      ctx.interner.map.emplace(s, idx);
      if (s.size() == 1) ctx.interner.char_ids[(unsigned char)s[0]] = idx;
      start = nl + 1;
      ++idx;
    }
  }

  run_file(ctx);

  view->contig_id = res->contig_id.data();
  view->pos = res->pos.data();
  view->vocab = res->vocab.data();
  view->weight = res->weight.data();
  view->n_events = (int64_t)res->pos.size();
  view->new_vocab = res->new_vocab.data();
  view->new_vocab_len = (int64_t)res->new_vocab.size();
  view->n_new_vocab = res->n_new_vocab;
  view->alignment_count = res->alignment_count;
  view->used_count = res->used_count;
  view->read_count = res->read_count;
  view->status = res->status;
  view->error = res->error.c_str();
  return view;
}

void pp_free_result(PPResultView* view) {
  if (!view) return;
  delete static_cast<Result*>(view->handle);
  delete view;
}

}  // extern "C"
