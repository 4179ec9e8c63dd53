// Fused ggml-q4-block-stream -> MXU-tiled layout repack (native core).
//
// The Python loader's hot term is re-layouting Q4 weights from the ggml
// block stream (per stored row: K/32 blocks of [f32 scale (+f32 min),
// 16 pairwise-nibble bytes]; bert.cpp:638 asserts ne[0] % 64 == 0) into
// the TPU layout (bert_tpu/quant.py pack_tpu_layout: packed[K/2, N]
// group-local half-split, scales[K/32, N]). numpy needs ~4 strided
// passes with full-size temporaries; this does ONE tiled pass reading
// each input byte once and writing each output byte once — the
// TPU-native counterpart of the reference's fread-into-arena loader hot
// spot (bert.cpp:558-674).
//
// Layout contract (must match bert_tpu/quant.py, pinned bit-exact by
// tests/test_native.py::test_native_repack_matches_numpy):
//   input  block b of stored row nn covers K columns 32b..32b+31,
//          byte j = c[32b+2j] | c[32b+2j+1] << 4
//   output packed[(32g + r)*N + nn] = A | B<<4 where
//          A = element r of block 2g, B = element r of block 2g+1
//          scales[b*N + nn] = scale of block b (mins likewise, q4_1)

#include <cstdint>
#include <cstring>

extern "C" {

// qraw: n * (k/32) blocks, each (meta + 16) bytes; meta = 4 (q4_0: f32
// scale) or 8 (q4_1: f32 scale + f32 min). packed: [k/2, n] out.
// scales/mins: [k/32, n] f32 out (mins may be null for q4_0).
// Returns 0 on success, -1 on bad arguments.
int q4_repack_stream_tpu(const uint8_t* qraw, int64_t n, int64_t k,
                         int32_t meta, uint8_t* packed, float* scales,
                         float* mins) {
    if (!qraw || !packed || !scales || n <= 0 || k <= 0 || k % 64 != 0 ||
        (meta != 4 && meta != 8) || (meta == 8 && !mins))
        return -1;
    const int64_t bs = meta + 16;        // bytes per block
    const int64_t row_bytes = (k / 32) * bs;
    const int64_t groups = k / 64;
    constexpr int64_t TILE = 128;        // stored-row tile (write locality)

    for (int64_t nt = 0; nt < n; nt += TILE) {
        const int64_t nte = nt + TILE < n ? nt + TILE : n;
        for (int64_t g = 0; g < groups; ++g) {
            uint8_t* out_base = packed + (g * 32) * n;
            for (int64_t nn = nt; nn < nte; ++nn) {
                const uint8_t* b0 = qraw + nn * row_bytes + (2 * g) * bs;
                const uint8_t* b1 = b0 + bs;
                float s0, s1;
                std::memcpy(&s0, b0, 4);
                std::memcpy(&s1, b1, 4);
                scales[(2 * g) * n + nn] = s0;
                scales[(2 * g + 1) * n + nn] = s1;
                if (meta == 8) {
                    float m0, m1;
                    std::memcpy(&m0, b0 + 4, 4);
                    std::memcpy(&m1, b1 + 4, 4);
                    mins[(2 * g) * n + nn] = m0;
                    mins[(2 * g + 1) * n + nn] = m1;
                }
                const uint8_t* p0 = b0 + meta;
                const uint8_t* p1 = b1 + meta;
                uint8_t* out = out_base + nn;
                for (int j = 0; j < 16; ++j) {
                    const uint8_t lo = p0[j], hi = p1[j];
                    // elements 2j (low nibbles) and 2j+1 (high nibbles)
                    out[(int64_t)(2 * j) * n] =
                        (uint8_t)((lo & 0x0F) | ((hi & 0x0F) << 4));
                    out[(int64_t)(2 * j + 1) * n] =
                        (uint8_t)((lo >> 4) | (hi & 0xF0));
                }
            }
        }
    }
    return 0;
}

}  // extern "C"
