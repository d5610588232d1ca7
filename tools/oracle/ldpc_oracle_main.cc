// Oracle harness: decode int8 LLR frames with the reference's generic
// layered decoder (compiled from the read-only reference tree).
// stdin: int8 LLRs (SIMD_WIDTH * N per batch); stdout: decoded hard bytes
// argv: TABLE number of trials
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include "ldpc.hh"
#include "generic.hh"
#include "layered_decoder.hh"
#include "algorithms.hh"
#include "dvb_s2_tables.hh"

constexpr int WIDTH = 16;
typedef SIMD<int8_t, WIDTH> simd_t;
typedef NormalUpdate<simd_t> update_t;
typedef OffsetMinSumAlgorithm<simd_t, update_t, 2> algorithm_t;

int main(int argc, char** argv) {
    int trials = argc > 1 ? atoi(argv[1]) : 25;
    LDPCInterface* ldpc = new LDPC<DVB_S2_TABLE_B4>(); // normal 1/2
    LDPCDecoder<simd_t, algorithm_t> decoder;
    decoder.init(ldpc);
    int N = ldpc->code_len();
    int8_t* code = new int8_t[WIDTH * N];
    void* aligned = aligned_alloc(sizeof(simd_t), sizeof(simd_t) * N);
    while (fread(code, 1, WIDTH * N, stdin) == (size_t)(WIDTH * N)) {
        int count = decoder(aligned, code, trials);
        fprintf(stderr, "trials_left=%d\n", count);
        // emit hard decisions as bytes (1 = bit one i.e. negative LLR)
        for (int i = 0; i < WIDTH * N; i++) {
            int8_t v = code[i] < 0 ? 1 : 0;
            fwrite(&v, 1, 1, stdout);
        }
        fflush(stdout);
    }
    return 0;
}
