// gprof driver: decode a stream from stdin N times through mp3tpu_unpack.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>
extern "C" {
int mp3tpu_probe(const uint8_t* data, int64_t len, int32_t* meta);
int mp3tpu_unpack(const uint8_t* data, int64_t len, int16_t*, int16_t*,
                  int8_t*, uint8_t*, uint8_t*, int16_t*, int32_t*, int32_t*,
                  int32_t, int32_t, int32_t, uint8_t*, int16_t*, int32_t);
}
int main(int argc, char** argv) {
    int iters = argc > 1 ? atoi(argv[1]) : 50;
    std::vector<uint8_t> buf;
    int c;
    while ((c = getchar()) != EOF) buf.push_back(uint8_t(c));
    int32_t meta[4];
    int g = mp3tpu_probe(buf.data(), (int64_t)buf.size(), meta);
    if (g <= 0) return 1;
    std::vector<int16_t> exps(size_t(g)*2*64);
    std::vector<int8_t> bt(size_t(g)*2);
    std::vector<uint8_t> mixed(size_t(g)*2), smode(size_t(g)*64);
    std::vector<int16_t> err(size_t(g), 0);
    std::vector<int32_t> slack(size_t(g)*2), lines(size_t(g)*2);
    std::vector<uint8_t> is12(size_t(g)*2*864);
    std::vector<int16_t> esc(size_t(g)*2*32);
    for (int i = 0; i < iters; i++)
        mp3tpu_unpack(buf.data(), (int64_t)buf.size(), nullptr, exps.data(),
                      bt.data(), mixed.data(), smode.data(), err.data(),
                      slack.data(), lines.data(), 0, 1, 0,
                      is12.data(), esc.data(), 12);
    printf("done %d\n", g);
    return 0;
}
