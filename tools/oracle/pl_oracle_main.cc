// Oracle harness for the reference PL-layer primitives:
//   pi2map <hex_u64> <N>        -> N complex floats
//   pi2demap / pi2demapdiff     -> stdin complex floats, stdout hex u64
//   rmenc <plsc>                -> hex u64 codeword
//   rmdec_hard <hex_u64>        -> decoded plsc
//   rmdec_soft                  -> stdin 64 floats, stdout plsc
//   plscramble <gold> <len>     -> len complex descrambling factors
//   plscdec <coherent> <soft>   -> stdin 65 complex (last SOF sym + 64 PLSC
//                                  symbols), stdout decoded PLS
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include "pi2_bpsk.h"
#include "reed_muller.h"
#include "pl_descrambler.h"
#include "pl_signaling.h"
using namespace gr::dvbs2rx;

int main(int argc, char** argv) {
    std::string cmd = argv[1];
    if (cmd == "pi2map") {
        uint64_t code = strtoull(argv[2], nullptr, 16);
        int n = atoi(argv[3]);
        std::vector<gr_complex> out(n);
        map_bpsk(code, out.data(), n);
        fwrite(out.data(), sizeof(gr_complex), n, stdout);
    } else if (cmd == "pi2demap" || cmd == "pi2demapdiff") {
        int n = atoi(argv[2]);
        std::vector<gr_complex> in(n + 1);
        size_t cnt = fread(in.data(), sizeof(gr_complex), n + 1, stdin);
        uint64_t r = (cmd == "pi2demap") ? demap_bpsk(in.data() + 1, n)
                                         : demap_bpsk_diff(in.data(), n);
        printf("%016llx\n", (unsigned long long)r);
    } else if (cmd == "rmenc") {
        reed_muller rm;
        printf("%016llx\n", (unsigned long long)rm.encode(atoi(argv[2])));
    } else if (cmd == "rmdec_hard") {
        reed_muller rm;
        printf("%d\n", rm.decode(strtoull(argv[2], nullptr, 16)));
    } else if (cmd == "rmdec_soft") {
        reed_muller rm;
        float soft[64];
        fread(soft, sizeof(float), 64, stdin);
        printf("%d\n", rm.decode(soft));
    } else if (cmd == "plscdec") {
        bool coherent = atoi(argv[2]) != 0;
        bool soft = atoi(argv[3]) != 0;
        std::vector<gr_complex> in(65);
        size_t cnt = fread(in.data(), sizeof(gr_complex), 65, stdin);
        (void)cnt;
        plsc_decoder dec;
        dec.decode(in.data(), coherent, soft);
        printf("%d\n", dec.d_plsc);
    } else if (cmd == "plscramble") {
        pl_descrambler d(atoi(argv[2]));
        int len = atoi(argv[3]);
        std::vector<gr_complex> ones(len, gr_complex(1.0f, 0.0f));
        d.descramble(ones.data(), len);
        fwrite(d.get_payload(), sizeof(gr_complex), len, stdout);
    }
    return 0;
}
