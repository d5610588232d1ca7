// Oracle harness: encode/decode with the reference BCH codec.
// argv: mode(enc|dec) framesize(normal|short|medium) t n
// enc: stdin kbch/8 msg bytes per frame -> stdout n/8 codeword bytes
// dec: stdin n/8 codeword bytes -> stdout kbch/8 bytes + int32 n_corrected
#include <cstdio>
#include <cstring>
#include <string>
#include "bch.h"
using namespace gr::dvbs2rx;

int main(int argc, char** argv) {
    std::string mode = argv[1], fs = argv[2];
    int t = atoi(argv[3]);
    uint32_t n = atoi(argv[4]);
    uint32_t prim;
    if (fs == "normal") prim = 0b10000000000101101;
    else if (fs == "short") prim = 0b100000000101011;
    else prim = 0b1000000000101101;
    galois_field<uint32_t> gf((gf2_poly<uint32_t>(prim)));
    bch_codec<uint32_t, bitset256_t> codec(&gf, t, n);
    int k_bytes = codec.get_k() / 8, n_bytes = n / 8;
    std::vector<unsigned char> in(mode == "enc" ? k_bytes : n_bytes);
    std::vector<unsigned char> out(mode == "enc" ? n_bytes : k_bytes);
    while (fread(in.data(), 1, in.size(), stdin) == in.size()) {
        if (mode == "enc") {
            codec.encode(in.data(), out.data());
            fwrite(out.data(), 1, out.size(), stdout);
        } else {
            int corr = codec.decode(in.data(), out.data());
            fwrite(out.data(), 1, out.size(), stdout);
            fwrite(&corr, 4, 1, stdout);
        }
        fflush(stdout);
    }
    return 0;
}
