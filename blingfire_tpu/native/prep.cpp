// Native host-side batch preparation for the TPU tokenizer runtime.
//
// Performs the byte-level prelude of the sentence-piece pipeline
// (semantics: blingfiretokdll.cpp:1349-1496 in the reference):
//   UTF-8 validation/decoding (or raw-byte mode), BOM strip, dummy-prefix
//   insertion, charmap normalization (1->N), whitespace-run squeeze to
//   U+2581, dense-alphabet remap, and fixed-shape batch packing.
//
// Exposed as a C ABI consumed via ctypes; one call prepares a whole batch.
// This is the production data-loader path; the NumPy implementation in
// runtime/host.py remains as the reference/fallback.

#include <cstdint>
#include <cstring>

extern "C" {

// whitespace class, blingfiretokdll.h:16-21
static inline bool is_ws(int32_t c) {
    return (c <= 0x20 || c == 0xa0 || (c >= 0x2000 && c <= 0x200f) ||
            c == 0x202f || c == 0x205f || c == 0x2060 || c == 0x2420 ||
            c == 0x2424 || c == 0x3000 || c == 0xfeff);
}

static const int32_t SPM = 0x2581;

// strict UTF-8 decode (FAUtf8Utils.cpp:58-118): returns count or -1
static int decode_utf8(const uint8_t* s, int n, int32_t* out, int32_t* offs,
                       int max_out) {
    int i = 0;
    if (n >= 3 && s[0] == 0xEF && s[1] == 0xBB && s[2] == 0xBF) i = 3;
    int k = 0;
    while (i < n && k < max_out) {
        uint8_t b0 = s[i];
        int cnt, ch;
        if ((b0 & 0x80) == 0) { cnt = 1; ch = b0; }
        else if ((b0 & 0xE0) == 0xC0) { cnt = 2; ch = b0 & 0x1F; }
        else if ((b0 & 0xF0) == 0xE0) { cnt = 3; ch = b0 & 0x0F; }
        else if ((b0 & 0xF8) == 0xF0) { cnt = 4; ch = b0 & 0x07; }
        else return -1;
        if (i + cnt > n) return -1;
        for (int j = 1; j < cnt; ++j) {
            uint8_t bj = s[i + j];
            if ((bj & 0xC0) != 0x80) return -1;
            ch = (ch << 6) | (bj & 0x3F);
        }
        int exp = ch <= 0x7F ? 1 : ch <= 0x7FF ? 2 : ch <= 0xFFFF ? 3
                 : ch <= 0x10FFFF ? 4 : 0;
        if (exp != cnt) return -1;
        if ((ch & 0xFFFFF800) == 0xD800) return -1;
        out[k] = ch;
        if (offs) offs[k] = i;
        ++k;
        i += cnt;
    }
    return k;
}

// Prepare one batch of documents for the [pos-dict] device kernels.
//
//  docs        concatenated document bytes
//  doc_off     int64[n_docs+1] offsets into docs
//  use_raw_bytes / no_dummy_prefix  model flags
//  cm_*        charmap tables (NULL cm_counts disables): dense over
//              [cm_min, cm_max], counts<0 = identity, 0 or >10 = drop
//  sym2iw      dense raw-symbol -> input-weight map, length sym2iw_len
//              (missing symbols map to -1 = walk dies)
//  n_sym       row width of the output batch
//  x_iw        int32[n_docs * n_sym]  (pre-filled by caller or not; we fill)
//  is_spm      uint8[n_docs * n_sym]
//  lengths     int32[n_docs]
//  sym_off     int32[n_docs * n_sym] byte offset per kept symbol (or NULL)
//  status      uint8[n_docs]: 0 ok, 1 invalid-input, 2 overflow(fallback)
//
// scratch workspace is allocated internally per call (thread-local reuse).
int btl_prep_sp_batch(const uint8_t* docs, const int64_t* doc_off, int n_docs,
                      int use_raw_bytes, int no_dummy_prefix,
                      const int32_t* cm_counts, const int32_t* cm_values,
                      int cm_width, int cm_min, int cm_max,
                      const int32_t* sym2iw, int64_t sym2iw_len,
                      int n_sym, int32_t* x_iw, uint8_t* is_spm,
                      int32_t* lengths, int32_t* sym_off, uint8_t* status) {
    // worst case symbols per doc: 2 * bytes + 1 (charmap can double)
    int64_t max_doc = 0;
    for (int d = 0; d < n_docs; ++d) {
        int64_t len = doc_off[d + 1] - doc_off[d];
        if (len > max_doc) max_doc = len;
    }
    int64_t cap = 10 * max_doc + 16;  // charmap may expand 1 -> up to 10
    int32_t* buf = new int32_t[cap];
    int32_t* offs = sym_off ? new int32_t[cap] : nullptr;
    int32_t* nbuf = new int32_t[cap];
    int32_t* noffs = sym_off ? new int32_t[cap] : nullptr;

    for (int d = 0; d < n_docs; ++d) {
        const uint8_t* p = docs + doc_off[d];
        int n = (int)(doc_off[d + 1] - doc_off[d]);
        int32_t* xrow = x_iw + (int64_t)d * n_sym;
        uint8_t* srow = is_spm + (int64_t)d * n_sym;
        int32_t* orow = sym_off ? sym_off + (int64_t)d * n_sym : nullptr;
        for (int j = 0; j < n_sym; ++j) { xrow[j] = -1; srow[j] = 0; }
        lengths[d] = 0;
        status[d] = 0;
        if (n == 0) { status[d] = 1; continue; }

        int k = 0;
        int base = 0;
        if (!no_dummy_prefix) { buf[0] = SPM; if (offs) offs[0] = -1; base = 1; }
        int got;
        if (use_raw_bytes) {
            int i = 0;
            if (n >= 3 && p[0] == 0xEF && p[1] == 0xBB && p[2] == 0xBF) i = 3;
            got = 0;
            for (; i < n; ++i) {
                buf[base + got] = p[i];
                if (offs) offs[base + got] = i;
                ++got;
            }
        } else {
            got = decode_utf8(p, n, buf + base, offs ? offs + base : nullptr, n);
        }
        if (got <= 0 || got > n) { status[d] = 1; continue; }
        k = base + got;

        // charmap normalization (FAUtils_cl.h:312-436)
        int32_t* cur = buf;
        int32_t* curo = offs;
        if (cm_counts) {
            int m = 0;
            for (int i = 0; i < k; ++i) {
                int32_t c = cur[i];
                int cnt = -1;
                if (c >= cm_min && c <= cm_max) cnt = cm_counts[c - cm_min];
                if (cnt > cm_width) cnt = -1;
                if (cnt < 0) {
                    nbuf[m] = c;
                    if (noffs) noffs[m] = curo[i];
                    ++m;
                } else if (cnt >= 1 && cnt <= 10) {
                    const int32_t* v = cm_values + (int64_t)(c - cm_min) * cm_width;
                    for (int j = 0; j < cnt; ++j) {
                        nbuf[m] = v[j];
                        if (noffs) noffs[m] = curo[i];
                        ++m;
                    }
                } // cnt == 0 or > 10: dropped
            }
            // reference bails out when normalization overflows its
            // 2*(bytes+1) buffer (blingfiretokdll.cpp:1438-1445)
            if (m <= 0 || m > 2 * (n + 1)) { status[d] = 1; continue; }
            cur = nbuf;
            curo = noffs;
            k = m;
        }

        // whitespace squeeze (blingfiretokdll.cpp:1462-1496)
        int w = 0;
        for (int i = 0; i < k; ++i) {
            int32_t c = cur[i];
            if (!is_ws(c)) {
                cur[w] = c;
                if (curo) curo[w] = curo[i];
                ++w;
            } else if (w == 0 || cur[w - 1] != SPM) {
                cur[w] = SPM;
                if (curo) curo[w] = curo[i];
                ++w;
            }
        }
        if (w > 1 && cur[w - 1] == SPM) --w;
        k = w;

        if (k > n_sym) { status[d] = 2; continue; }

        // dense remap + pack
        for (int i = 0; i < k; ++i) {
            int32_t c = cur[i];
            xrow[i] = (c >= 0 && c < sym2iw_len) ? sym2iw[c] : -1;
            srow[i] = (c == SPM) ? 1 : 0;
            if (orow) orow[i] = curo[i];
        }
        lengths[d] = k;
    }

    delete[] buf;
    delete[] nbuf;
    if (offs) delete[] offs;
    if (noffs) delete[] noffs;
    return 0;
}

int btl_version() { return 1000; }

}  // extern "C"
