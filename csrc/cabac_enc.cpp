// Native CABAC slice serializer for the all-intra HEVC build.
//
// The serial tail of the two-phase encoder (SURVEY.md §7.1): the TPU
// produces modes/levels in parallel; this C++ hot loop binarizes and
// arithmetic-codes the slice data.  Behavioral twin of
// video_codecs_tpu/entropy/{cabac,residual}.py + intra_codec._encode_ctu —
// the Python side remains the reference; tests assert byte-identical
// output.  Parity: HM TEncBinCoderCABAC.cpp:187, TEncSbac codeCoeffNxN.
//
// Exposed C API (ctypes):
//   int vct_encode_slice(...) -> number of EBSP bytes written (or -1).
//   Context layout/initial states are passed in from Python so the tables
//   live in exactly one place (entropy/ctx.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// spec Table 9-46 (TComCABACTables.cpp:43)
static const uint8_t kLps[64][4] = {
    {128, 176, 208, 240}, {128, 167, 197, 227}, {128, 158, 187, 216},
    {123, 150, 178, 205}, {116, 142, 169, 195}, {111, 135, 160, 185},
    {105, 128, 152, 175}, {100, 122, 144, 166}, {95, 116, 137, 158},
    {90, 110, 130, 150},  {85, 104, 123, 142},  {81, 99, 117, 135},
    {77, 94, 111, 128},   {73, 89, 105, 122},   {69, 85, 100, 116},
    {66, 80, 95, 110},    {62, 76, 90, 104},    {59, 72, 86, 99},
    {56, 69, 81, 94},     {53, 65, 77, 89},     {51, 62, 73, 85},
    {48, 59, 69, 80},     {46, 56, 66, 76},     {43, 53, 63, 72},
    {41, 50, 59, 69},     {39, 48, 56, 65},     {37, 45, 54, 62},
    {35, 43, 51, 59},     {33, 41, 48, 56},     {32, 39, 46, 53},
    {30, 37, 43, 50},     {29, 35, 41, 48},     {27, 33, 39, 45},
    {26, 31, 37, 43},     {24, 30, 35, 41},     {23, 28, 33, 39},
    {22, 27, 32, 37},     {21, 26, 30, 35},     {20, 24, 29, 33},
    {19, 23, 27, 31},     {18, 22, 26, 30},     {17, 21, 25, 28},
    {16, 20, 23, 27},     {15, 19, 22, 25},     {14, 18, 21, 24},
    {14, 17, 20, 23},     {13, 16, 19, 22},     {12, 15, 18, 21},
    {12, 14, 17, 20},     {11, 14, 16, 19},     {11, 13, 15, 18},
    {10, 12, 15, 17},     {10, 12, 14, 16},     {9, 11, 13, 15},
    {9, 11, 12, 14},      {8, 10, 12, 14},      {8, 9, 11, 13},
    {7, 9, 11, 12},       {7, 9, 10, 12},       {7, 8, 10, 11},
    {6, 8, 9, 11},        {6, 7, 9, 10},        {6, 7, 8, 9},
    {2, 2, 2, 2}};

// Packed-128 state transitions (ContextModel.cpp:67-89).
static const uint8_t kNextMps[128] = {
    2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39,
    40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57,
    58, 59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75,
    76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89, 90, 91, 92, 93,
    94, 95, 96, 97, 98, 99, 100, 101, 102, 103, 104, 105, 106, 107, 108, 109,
    110, 111, 112, 113, 114, 115, 116, 117, 118, 119, 120, 121, 122, 123,
    124, 125, 124, 125, 126, 127};
static const uint8_t kNextLps[128] = {
    1, 0, 0, 1, 2, 3, 4, 5, 4, 5, 8, 9, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 18, 19, 22, 23, 22, 23, 24, 25, 26, 27, 26, 27, 30, 31, 30,
    31, 32, 33, 32, 33, 36, 37, 36, 37, 38, 39, 38, 39, 42, 43, 42, 43, 44,
    45, 44, 45, 46, 47, 48, 49, 48, 49, 50, 51, 52, 53, 52, 53, 54, 55, 54,
    55, 56, 57, 58, 59, 58, 59, 60, 61, 60, 61, 60, 61, 62, 63, 64, 65, 64,
    65, 66, 67, 66, 67, 66, 67, 68, 69, 68, 69, 70, 71, 70, 71, 70, 71, 72,
    73, 72, 73, 72, 73, 74, 75, 74, 75, 74, 75, 76, 77, 76, 77, 126, 127};

static const int kGroupIdx[32] = {0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6,
                                  7, 7, 7, 7, 8, 8, 8, 8, 8, 8, 8, 8,
                                  9, 9, 9, 9, 9, 9, 9, 9};
static const int kMinInGroup[10] = {0, 1, 2, 3, 4, 6, 8, 12, 16, 24};
static const int kCtxIndMap4x4[16] = {0, 1, 4, 5, 2, 3, 4, 5,
                                      6, 6, 8, 8, 7, 7, 8, 8};

struct BitWriter {
  std::vector<uint8_t>* out;
  uint64_t cur = 0;
  int nbits = 0;
  void put(uint32_t v, int n) {
    cur = (cur << n) | v;
    nbits += n;
    while (nbits >= 8) {
      nbits -= 8;
      out->push_back(uint8_t((cur >> nbits) & 0xff));
    }
    cur &= (1u << nbits) - 1;
  }
};

struct Cabac {
  BitWriter* bw;
  uint8_t* states;
  uint32_t low = 0, range = 510;
  int bits_outstanding = 0;
  bool first_bit = true;

  void put_bit(int b) {
    if (first_bit)
      first_bit = false;
    else
      bw->put(b, 1);
    while (bits_outstanding > 0) {
      bw->put(1 - b, 1);
      --bits_outstanding;
    }
  }
  void renorm() {
    while (range < 256) {
      if (low >= 512) {
        put_bit(1);
        low -= 512;
      } else if (low < 256) {
        put_bit(0);
      } else {
        ++bits_outstanding;
        low -= 256;
      }
      low <<= 1;
      range <<= 1;
    }
  }
  void bin(int ctx, int b) {
    uint8_t s = states[ctx];
    uint32_t lps = kLps[s >> 1][(range >> 6) & 3];
    range -= lps;
    if (b != (s & 1)) {
      low += range;
      range = lps;
      states[ctx] = kNextLps[s];
    } else {
      states[ctx] = kNextMps[s];
    }
    renorm();
  }
  void bypass(int b) {
    low <<= 1;
    if (b) low += range;
    if (low >= 1024) {
      put_bit(1);
      low -= 1024;
    } else if (low < 512) {
      put_bit(0);
    } else {
      ++bits_outstanding;
      low -= 512;
    }
  }
  void bypass_bins(uint32_t v, int n) {
    for (int i = n - 1; i >= 0; --i) bypass((v >> i) & 1);
  }
  void terminate(int b) {
    range -= 2;
    if (b) {
      low += range;
      flush();
    } else {
      renorm();
    }
  }
  void flush() {
    range = 2;
    renorm();
    put_bit((low >> 9) & 1);
    bw->put(((low >> 7) & 3) | 1, 2);
  }
};

struct Offsets {
  int part_size, prev_intra, chroma_pred, cbf_luma, cbf_chroma;
  int last_x, last_y, sig_cg, sig_flag, one_flag, abs_flag;
};

// 4x4 up-right diagonal scan: scan position -> raster position in 4x4.
static const int kDiag4[16] = {0, 4, 1, 8, 5, 2, 12, 9,
                               6, 3, 13, 10, 7, 14, 11, 15};

struct ScanTables {
  // For a 2^log2 square TB with diagonal scan: CG scan list and flags.
  std::vector<int> cg_scan;  // scan idx -> cg raster
  int cg_w;
  void init(int log2) {
    int n = 1 << log2;
    cg_w = n >> 2;
    if (cg_w == 0) cg_w = 1;
    cg_scan.clear();
    // up-right diagonal over cg grid
    int x = 0, y = 0, size = cg_w;
    while ((int)cg_scan.size() < size * size) {
      while (y >= 0) {
        if (x < size && y < size) cg_scan.push_back(y * size + x);
        --y;
        ++x;
      }
      y = x;
      x = 0;
    }
  }
};

static void encode_last_xy(Cabac& c, const Offsets& o, int lx, int ly,
                           int log2, bool luma) {
  int off, shift;
  if (luma) {
    off = 3 * (log2 - 2) + ((log2 - 1) >> 2);
    shift = (log2 + 1) >> 2;
  } else {
    off = 15;
    shift = log2 - 2;
  }
  int gx = kGroupIdx[lx], gy = kGroupIdx[ly];
  int max_group = (log2 << 1) - 1;
  for (int i = 0; i < gx; ++i) c.bin(o.last_x + off + (i >> shift), 1);
  if (gx < max_group) c.bin(o.last_x + off + (gx >> shift), 0);
  for (int i = 0; i < gy; ++i) c.bin(o.last_y + off + (i >> shift), 1);
  if (gy < max_group) c.bin(o.last_y + off + (gy >> shift), 0);
  if (gx > 3) c.bypass_bins(lx - kMinInGroup[gx], (gx >> 1) - 1);
  if (gy > 3) c.bypass_bins(ly - kMinInGroup[gy], (gy >> 1) - 1);
}

static void encode_remainder(Cabac& c, int value, int rice) {
  if (value < (3 << rice)) {
    int length = value >> rice;
    c.bypass_bins((1u << (length + 1)) - 2, length + 1);
    c.bypass_bins(value & ((1 << rice) - 1), rice);
  } else {
    int length = rice;
    value -= 3 << rice;
    while (value >= (1 << length)) value -= 1 << (length++);
    c.bypass_bins((1u << (3 + length + 1 - rice)) - 2, 3 + length + 1 - rice);
    c.bypass_bins(value, length);
  }
}

static int sig_ctx_inc(int pattern, int px, int py, int log2, bool luma,
                       int first_ctx) {
  if (px + py == 0) return 0;
  if (log2 == 2) return first_ctx + kCtxIndMap4x4[4 * py + px];
  int xp = px & 3, yp = py & 3, cnt;
  switch (pattern) {
    case 0: {
      int tot = xp + yp;
      cnt = tot >= 3 ? 0 : (tot >= 1 ? 1 : 2);
      break;
    }
    case 1:
      cnt = yp >= 2 ? 0 : (yp >= 1 ? 1 : 2);
      break;
    case 2:
      cnt = xp >= 2 ? 0 : (xp >= 1 ? 1 : 2);
      break;
    default:
      cnt = 2;
  }
  bool not_first = ((px >> 2) + (py >> 2)) > 0;
  int offset = (not_first && luma ? 3 : 0) + cnt;
  return first_ctx + offset;
}

static void encode_residual(Cabac& c, const Offsets& o, const int32_t* lv,
                            int log2, bool luma, bool sign_hiding) {
  int n = 1 << log2;
  ScanTables st;
  st.init(log2);
  int num_cg = (n * n) >> 4;
  int cg_w = st.cg_w;

  // scan-ordered coefficients: coeffs[i*16+k] where CG i at cg_scan[i]
  std::vector<int32_t> coeffs(n * n);
  std::vector<int> csbf(num_cg, 0);
  int last_scan = -1;
  for (int i = 0; i < num_cg; ++i) {
    int cgr = st.cg_scan[i];
    int cgx = cgr % cg_w, cgy = cgr / cg_w;
    for (int k = 0; k < 16; ++k) {
      int rin = kDiag4[k];
      int px = (cgx << 2) + (rin & 3), py = (cgy << 2) + (rin >> 2);
      int32_t v = lv[py * n + px];
      coeffs[i * 16 + k] = v;
      if (v) {
        csbf[cgr] = 1;
        last_scan = i * 16 + k;
      }
    }
  }
  int last_cg = last_scan >> 4;
  int lr = st.cg_scan[last_cg];
  int rin = kDiag4[last_scan & 15];
  int lx = ((lr % cg_w) << 2) + (rin & 3);
  int ly = ((lr / cg_w) << 2) + (rin >> 2);
  encode_last_xy(c, o, lx, ly, log2, luma);

  int first_ctx, single_ctx;
  if (luma) {
    first_ctx = log2 == 2 ? 0 : (log2 == 3 ? 9 : 21);
    single_ctx = 27;
  } else {
    first_ctx = log2 == 2 ? 0 : (log2 == 3 ? 9 : 12);
    single_ctx = 15;
  }
  int sig_base = o.sig_flag + (luma ? 0 : 28);

  int c1 = 1;
  for (int i = last_cg; i >= 0; --i) {
    int cgr = st.cg_scan[i];
    int cgx = cgr % cg_w, cgy = cgr / cg_w;
    int right = (cgx + 1 < cg_w) ? csbf[cgr + 1] : 0;
    int below = (cgy + 1 < cg_w) ? csbf[cgr + cg_w] : 0;
    int pattern = right + 2 * below;

    int infer_dc = 0;
    if (i < last_cg && i > 0) {
      int ctx = o.sig_cg + ((right || below) ? 1 : 0) + (luma ? 0 : 2);
      c.bin(ctx, csbf[cgr]);
      infer_dc = 1;
      if (!csbf[cgr]) continue;
    }

    const int32_t* cgc = &coeffs[i * 16];
    int start_n = (i == last_cg) ? (last_scan - i * 16 - 1) : 15;
    for (int k = start_n; k >= 0; --k) {
      int sig = cgc[k] != 0;
      if (k > 0 || !infer_dc) {
        int ri = kDiag4[k];
        int px = (cgx << 2) + (ri & 3), py = (cgy << 2) + (ri >> 2);
        int sc = (first_ctx == single_ctx)
                     ? first_ctx
                     : sig_ctx_inc(pattern, px, py, log2, luma, first_ctx);
        c.bin(sig_base + sc, sig);
      }
      if (sig) infer_dc = 0;
    }

    int sig_pos[16], nsig = 0;
    for (int k = 15; k >= 0; --k)
      if (cgc[k]) sig_pos[nsig++] = k;
    if (!nsig) continue;
    bool hidden = sign_hiding && (sig_pos[0] - sig_pos[nsig - 1] > 3);

    int ctx_set = (i == 0 || !luma) ? 0 : 2;
    if (c1 == 0) ctx_set += 1;
    c1 = 1;
    int one_base = o.one_flag + (luma ? ctx_set * 4 : 16 + ctx_set * 4);
    int abs_base = o.abs_flag + (luma ? ctx_set : 4 + ctx_set);

    int num_c1 = nsig < 8 ? nsig : 8;
    int first_c2 = -1;
    for (int k = 0; k < num_c1; ++k) {
      int a = cgc[sig_pos[k]];
      if (a < 0) a = -a;
      int sym = a > 1;
      c.bin(one_base + c1, sym);
      if (sym) {
        c1 = 0;
        if (first_c2 < 0) first_c2 = k;
      } else if (c1 > 0 && c1 < 3) {
        ++c1;
      }
    }
    if (first_c2 >= 0) {
      int a = cgc[sig_pos[first_c2]];
      if (a < 0) a = -a;
      c.bin(abs_base, a > 2);
    }
    int nsigns = hidden ? nsig - 1 : nsig;
    for (int k = 0; k < nsigns; ++k) c.bypass(cgc[sig_pos[k]] < 0);

    int rice = 0, first_coeff2 = 1;
    for (int k = 0; k < nsig; ++k) {
      int a = cgc[sig_pos[k]];
      if (a < 0) a = -a;
      int base_level = k < 8 ? 2 + first_coeff2 : 1;
      if (a >= base_level) {
        encode_remainder(c, a - base_level, rice);
        if (a > (3 << rice) && rice < 4) ++rice;
      }
      if (a >= 2) first_coeff2 = 0;
    }
  }
}

}  // namespace

extern "C" {

// Returns number of bytes written to `out` (EBSP payload: header bytes +
// slice data with emulation prevention), or -1 on overflow.
int vct_encode_slice(int bw, int bh, int /*qp*/, const int32_t* modes,
                     const uint8_t* cbf,        // [3][B]
                     const int32_t* levels_y,   // [B][256]
                     const int32_t* levels_cb,  // [B][64]
                     const int32_t* levels_cr,  // [B][64]
                     const uint8_t* header, int header_len,
                     const uint8_t* init_states, int num_ctx,
                     const int* offs,  // 11 offsets, order as struct Offsets
                     uint8_t* out, int out_capacity, int sign_hiding) {
  Offsets o;
  o.part_size = offs[0];
  o.prev_intra = offs[1];
  o.chroma_pred = offs[2];
  o.cbf_luma = offs[3];
  o.cbf_chroma = offs[4];
  o.last_x = offs[5];
  o.last_y = offs[6];
  o.sig_cg = offs[7];
  o.sig_flag = offs[8];
  o.one_flag = offs[9];
  o.abs_flag = offs[10];

  std::vector<uint8_t> rbsp(header, header + header_len);
  BitWriter bwr;
  bwr.out = &rbsp;
  std::vector<uint8_t> states(init_states, init_states + num_ctx);
  Cabac c;
  c.bw = &bwr;
  c.states = states.data();

  int b = bw * bh;
  for (int i = 0; i < b; ++i) {
    int left_mode = (i % bw) ? modes[i - 1] : 1;
    int mode = modes[i];
    // part_mode 2Nx2N
    c.bin(o.part_size, 1);
    // MPM (above candidate always DC at CTB granularity)
    int mpm[3];
    if (left_mode < 2) {
      mpm[0] = 0;
      mpm[1] = 1;
      mpm[2] = 26;
    } else {
      mpm[0] = left_mode;
      mpm[1] = 1;
      mpm[2] = 0;
    }
    int idx = mode == mpm[0] ? 0 : (mode == mpm[1] ? 1 : (mode == mpm[2] ? 2 : -1));
    if (idx >= 0) {
      c.bin(o.prev_intra, 1);
      c.bypass(idx == 0 ? 0 : 1);
      if (idx) c.bypass(idx - 1);
    } else {
      c.bin(o.prev_intra, 0);
      int rem = mode;
      for (int k = 0; k < 3; ++k)
        if (mode > mpm[k]) --rem;
      c.bypass_bins(rem, 5);
    }
    c.bin(o.chroma_pred, 0);  // DM
    int cbf_y = cbf[i], cbf_cb = cbf[b + i], cbf_cr = cbf[2 * b + i];
    c.bin(o.cbf_chroma, cbf_cb);
    c.bin(o.cbf_chroma, cbf_cr);
    c.bin(o.cbf_luma + 1, cbf_y);
    if (cbf_y) encode_residual(c, o, levels_y + i * 256, 4, true, sign_hiding);
    if (cbf_cb) encode_residual(c, o, levels_cb + i * 64, 3, false, sign_hiding);
    if (cbf_cr) encode_residual(c, o, levels_cr + i * 64, 3, false, sign_hiding);
    c.terminate(i == b - 1 ? 1 : 0);
  }
  // byte-align; flush's last bit is the rbsp stop bit
  if (bwr.nbits) bwr.put(0, 8 - bwr.nbits);

  // emulation prevention
  int zeros = 0, pos = 0;
  for (size_t k = 0; k < rbsp.size(); ++k) {
    uint8_t byte = rbsp[k];
    if (zeros >= 2 && byte <= 3) {
      if (pos >= out_capacity) return -1;
      out[pos++] = 3;
      zeros = 0;
    }
    if (pos >= out_capacity) return -1;
    out[pos++] = byte;
    zeros = byte == 0 ? zeros + 1 : 0;
  }
  return pos;
}
}
