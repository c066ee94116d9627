// termblit — native terminal presentation for ascii_renderer_tpu.
//
// The reference's presentation layer is a browser canvas + DOM text overlay
// (js/ascii_pass.js, js/text_overlay.js). The terminal equivalent needs to
// turn a (chars, rgb-tint) cell grid into an ANSI escape stream at frame
// rate; doing that per-cell in Python costs more than the TPU render, so
// the encoder is native:
//
//   - 24-bit SGR foreground colors, emitted only when the color changes
//     across a run (typical frames have long same-color runs);
//   - damage tracking against the previous frame: unchanged rows are
//     skipped entirely, changed rows repaint from the first to the last
//     dirty column;
//   - output is one contiguous buffer handed back to Python for a single
//     write() syscall.
//
// C ABI only (consumed via ctypes — no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

inline char *put(char *p, const char *s) {
    while (*s) *p++ = *s++;
    return p;
}

inline char *put_u16(char *p, unsigned v) {
    // decimal itoa for values < 65536
    char tmp[8];
    int n = 0;
    do {
        tmp[n++] = char('0' + v % 10);
        v /= 10;
    } while (v);
    while (n) *p++ = tmp[--n];
    return p;
}

inline char *sgr_fg(char *p, uint8_t r, uint8_t g, uint8_t b) {
    p = put(p, "\x1b[38;2;");
    p = put_u16(p, r);
    *p++ = ';';
    p = put_u16(p, g);
    *p++ = ';';
    p = put_u16(p, b);
    *p++ = 'm';
    return p;
}

inline char *cursor_to(char *p, unsigned row, unsigned col) {
    // 1-based ANSI coordinates
    p = put(p, "\x1b[");
    p = put_u16(p, row + 1);
    *p++ = ';';
    p = put_u16(p, col + 1);
    *p++ = 'H';
    return p;
}

}  // namespace

extern "C" {

// Worst-case output bytes for a full repaint (per-cell SGR + char).
long termblit_max_bytes(int rows, int cols) {
    return (long)rows * cols * 20 + (long)rows * 16 + 64;
}

// Encode one frame.
//   chars  u8[rows*cols]       glyph codes
//   rgb    u8[rows*cols*3]     per-cell foreground tint (ignored if !color)
//   prev_* same layout         previous frame, or NULL for a full repaint
//   out    byte buffer of termblit_max_bytes capacity
// Returns the number of bytes written.
long termblit_encode(const uint8_t *chars, const uint8_t *rgb,
                     const uint8_t *prev_chars, const uint8_t *prev_rgb,
                     int rows, int cols, int color, char *out) {
    char *p = out;
    int last_r = -1, last_g = -1, last_b = -1;
    for (int y = 0; y < rows; ++y) {
        const uint8_t *crow = chars + (size_t)y * cols;
        const uint8_t *rrow = rgb + (size_t)y * cols * 3;
        int x0 = 0, x1 = cols - 1;
        if (prev_chars) {
            const uint8_t *pc = prev_chars + (size_t)y * cols;
            const uint8_t *pr = prev_rgb + (size_t)y * cols * 3;
            while (x0 < cols) {
                bool same = crow[x0] == pc[x0];
                if (same && color)
                    same = 0 == memcmp(rrow + 3 * x0, pr + 3 * x0, 3);
                if (!same) break;
                ++x0;
            }
            if (x0 == cols) continue;  // row clean
            while (x1 > x0) {
                bool same = crow[x1] == pc[x1];
                if (same && color)
                    same = 0 == memcmp(rrow + 3 * x1, pr + 3 * x1, 3);
                if (!same) break;
                --x1;
            }
        }
        p = cursor_to(p, y, x0);
        for (int x = x0; x <= x1; ++x) {
            if (color) {
                int r = rrow[3 * x], g = rrow[3 * x + 1], b = rrow[3 * x + 2];
                if (r != last_r || g != last_g || b != last_b) {
                    p = sgr_fg(p, (uint8_t)r, (uint8_t)g, (uint8_t)b);
                    last_r = r;
                    last_g = g;
                    last_b = b;
                }
            }
            uint8_t c = crow[x];
            *p++ = (c >= 32 && c <= 126) ? (char)c : '?';
        }
    }
    p = put(p, "\x1b[0m");
    return p - out;
}

}  // extern "C"
