// tmalign_cli: drop-in CLI around the in-process TM-align library.
//
// The reference pipeline invokes a bundled `tmalign` binary as a subprocess
// per query-hit pair and regex-parses its stdout
// (merizo_search/programs/Foldclass/utils.py:75-158). That binary is a
// stripped blob in the mirror, so the reference pipeline cannot run as-is.
// This shim satisfies the exact same subprocess contract with the clean-room
// aligner in tmalign.cpp: the cross-implementation parity harness
// (tools/crossimpl_parity.py) builds it and drops it in as
// programs/Foldclass/tmalign, which lets the *reference* pipeline execute
// end-to-end — and, because our pipeline's native backend is the same
// aligner, any TSV diff between the two pipelines isolates pipeline-logic
// divergence rather than aligner differences.
//
// Usage: tmalign struct1.pdb struct2.pdb [-fast]
// (struct1 = query: the first printed TM-score is normalised by its length,
// matching the reference's qtm = tm_scores[0] at Foldclass/utils.py:148.)
//
// Output lines match extract_tmalign_values' regexes:
//   Aligned length= N, RMSD= X, Seq_ID=n_identical/n_aligned= Y
//   TM-score= Q (if normalized by length of Chain_1)
//   TM-score= T (if normalized by length of Chain_2)
//
// Build (tools/crossimpl_parity.py does this):
//   g++ -O3 -o tmalign tmalign_cli.cpp tmalign.cpp -lpthread

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" int tmalign_pair(const float* xq, int nx, const float* xt, int ny,
                            int fast, double* out, int* ali_out);

namespace {

struct Chain {
  std::vector<float> xyz;       // [n*3]
  std::vector<std::string> res; // 3-letter codes, [n]
  int n = 0;
};

// CA-only PDB reader with the same column conventions as the reference's
// read_pdb (Foldclass/utils.py:42-72): ATOM records, atom name ' CA '
// (cols 12-16), residue name cols 17-20, coords cols 30-54. Chain is NOT
// filtered: the tmp PDBs the pipeline writes are single-chain by
// construction (write_pdb emits chain 'A'), and the real TM-align binary
// reads the first chain regardless.
bool read_ca(const char* path, Chain* c) {
  FILE* f = std::fopen(path, "r");
  if (!f) return false;
  char line[256];
  while (std::fgets(line, sizeof line, f)) {
    size_t len = std::strlen(line);
    if (len < 54 || std::strncmp(line, "ATOM", 4) != 0) continue;
    if (std::strncmp(line + 12, " CA ", 4) != 0) continue;
    char buf[16];
    auto field = [&](int lo, int n) {
      std::memcpy(buf, line + lo, n);
      buf[n] = 0;
      return std::atof(buf);
    };
    c->xyz.push_back((float)field(30, 8));
    c->xyz.push_back((float)field(38, 8));
    c->xyz.push_back((float)field(46, 8));
    std::string r(line + 17, 3);
    // trim spaces so ' GLY' == 'GLY '
    while (!r.empty() && r.front() == ' ') r.erase(r.begin());
    while (!r.empty() && r.back() == ' ') r.pop_back();
    c->res.push_back(r);
    c->n++;
  }
  std::fclose(f);
  return c->n > 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s struct1.pdb struct2.pdb [-fast]\n",
                 argv[0]);
    return 2;
  }
  int fast = 0;
  for (int i = 3; i < argc; ++i)
    if (std::strcmp(argv[i], "-fast") == 0) fast = 1;
  Chain q, t;
  if (!read_ca(argv[1], &q)) {
    std::fprintf(stderr, "cannot read %s\n", argv[1]);
    return 1;
  }
  if (!read_ca(argv[2], &t)) {
    std::fprintf(stderr, "cannot read %s\n", argv[2]);
    return 1;
  }
  double out[4] = {0, 0, 0, 0};
  std::vector<int> ali(q.n, -1);
  if (tmalign_pair(q.xyz.data(), q.n, t.xyz.data(), t.n, fast, out,
                   ali.data()) != 0) {
    std::fprintf(stderr, "alignment failed\n");
    return 1;
  }
  int len_ali = (int)out[3];
  int n_ident = 0;
  for (int i = 0; i < q.n; ++i)
    if (ali[i] >= 0 && ali[i] < t.n && q.res[i] == t.res[ali[i]]) n_ident++;
  double seq_id = len_ali > 0 ? (double)n_ident / len_ali : 0.0;
  // Header mimicking the real binary closely enough for human eyes; only
  // the three regex-matched lines below are contractual.
  std::printf("Name of Chain_1: %s (to be superimposed onto Chain_2)\n",
              argv[1]);
  std::printf("Name of Chain_2: %s\n", argv[2]);
  std::printf("Length of Chain_1: %d residues\n", q.n);
  std::printf("Length of Chain_2: %d residues\n\n", t.n);
  std::printf(
      "Aligned length= %d, RMSD= %6.2f, Seq_ID=n_identical/n_aligned= %5.3f\n",
      len_ali, out[2], seq_id);
  std::printf("TM-score= %7.5f (if normalized by length of Chain_1, i.e., "
              "LN=%d, d0=%.2f)\n", out[0], q.n, 0.0);
  std::printf("TM-score= %7.5f (if normalized by length of Chain_2, i.e., "
              "LN=%d, d0=%.2f)\n", out[1], t.n, 0.0);
  return 0;
}
