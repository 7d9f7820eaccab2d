// Native raster codec: multithreaded TIFF strip/tile decompression.
//
// The TPU framework streams large GeoTIFF scenes tile-by-tile
// (pandora_tpu/parallel/scene.py); the host-side bottleneck is inflating
// thousands of deflate strips in Python.  This library decompresses all
// chunks of a raster in parallel with std::thread + zlib, writing each
// chunk at its caller-computed offset in the destination buffer.  The
// Python wrapper (pandora_tpu/io/raster.py) keeps IFD parsing, layout
// math and the pure-Python fallback.
//
// The reference reads rasters through rasterio/GDAL (img_tools.py:345-437);
// this is the from-scratch equivalent of GDAL's threaded TIFF decode path.
//
// Build: g++ -O3 -march=native -shared -fPIC raster_codec.cpp -o
//        libraster_codec.so -lz -lpthread

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// one chunk: inflate (or memcpy) raw[src_off, src_off+src_len) into
// dst[dst_off, dst_off+dst_cap)
struct Chunk {
  int64_t src_off;
  int64_t src_len;
  int64_t dst_off;
  int64_t dst_cap;
};

// TIFF PackBits (compression 32773): runs of [-127..-1] repeat the next
// byte (1 - n) times, [0..127] copy n+1 literal bytes, -128 is a no-op.
int decode_packbits(const uint8_t* src, int64_t src_len, uint8_t* dst,
                    int64_t dst_cap) {
  int64_t i = 0, o = 0;
  while (i < src_len && o < dst_cap) {
    int8_t n = static_cast<int8_t>(src[i++]);
    if (n >= 0) {
      int64_t cnt = static_cast<int64_t>(n) + 1;
      if (i + cnt > src_len || o + cnt > dst_cap) return -3;
      std::memcpy(dst + o, src + i, static_cast<size_t>(cnt));
      i += cnt;
      o += cnt;
    } else if (n != -128) {
      int64_t cnt = 1 - static_cast<int64_t>(n);
      if (i >= src_len || o + cnt > dst_cap) return -3;
      std::memset(dst + o, src[i++], static_cast<size_t>(cnt));
      o += cnt;
    }
  }
  return o == dst_cap ? 0 : -3;
}

// TIFF LZW (compression 5): MSB-first variable-width codes starting at
// 9 bits, ClearCode 256, EndOfInformation 257, with the TIFF "early
// change" (the code width bumps one code before the table fills).
int decode_lzw(const uint8_t* src, int64_t src_len, uint8_t* dst,
               int64_t dst_cap) {
  constexpr int kClear = 256, kEoi = 257, kFirst = 258, kMaxCode = 4096;
  // table entries as (prefix, suffix); strings materialized on emit
  std::vector<int> prefix(kMaxCode, -1);
  std::vector<uint8_t> suffix(kMaxCode, 0);
  for (int i = 0; i < 256; ++i) {
    suffix[i] = static_cast<uint8_t>(i);
  }
  int next_code = kFirst, width = 9;
  uint32_t bitbuf = 0;
  int bits = 0;
  int64_t i = 0, o = 0;
  int prev = -1;
  std::vector<uint8_t> scratch;
  scratch.reserve(kMaxCode);
  auto emit = [&](int code) -> int64_t {  // returns bytes written, -1 on err
    scratch.clear();
    int c = code;
    while (c >= 0) {
      scratch.push_back(suffix[c]);
      c = c < 256 ? -1 : prefix[c];
    }
    int64_t n = static_cast<int64_t>(scratch.size());
    if (o + n > dst_cap) n = dst_cap - o;
    for (int64_t k = 0; k < n; ++k) dst[o + k] = scratch[scratch.size() - 1 - k];
    return n;
  };
  while (o < dst_cap) {
    while (bits < width) {
      if (i >= src_len) return o == dst_cap ? 0 : -4;
      bitbuf = (bitbuf << 8) | src[i++];
      bits += 8;
    }
    int code = static_cast<int>((bitbuf >> (bits - width)) & ((1u << width) - 1));
    bits -= width;
    if (code == kEoi) break;
    if (code == kClear) {
      next_code = kFirst;
      width = 9;
      prev = -1;
      continue;
    }
    if (prev < 0) {  // first code after clear: literal
      if (code >= 256) return -4;
      dst[o++] = static_cast<uint8_t>(code);
      prev = code;
    } else {
      if (code > next_code || next_code >= kMaxCode) return -4;
      int emit_code = code;
      uint8_t first_byte;
      if (code == next_code) {  // KwKwK case: string = prev + first(prev)
        int c = prev;
        while (c >= 256) c = prefix[c];
        first_byte = suffix[c];
        prefix[next_code] = prev;
        suffix[next_code] = first_byte;
        ++next_code;
        o += emit(emit_code);
      } else {
        o += emit(emit_code);
        int c = code;
        while (c >= 256) c = prefix[c];
        prefix[next_code] = prev;
        suffix[next_code] = suffix[c];
        ++next_code;
      }
      prev = code;
    }
    // TIFF early change: widen one code early
    if (next_code == (1 << width) - 1 && width < 12) ++width;
  }
  // a truncated stream (early EOI) must surface as an error so the caller
  // falls back to the strict Python decoder instead of silently keeping a
  // zero-filled tail (same contract as decode_packbits)
  return o == dst_cap ? 0 : -4;
}

int decode_one(const uint8_t* raw, uint8_t* dst, const Chunk& c,
               int compression) {
  if (compression == 1) {  // none
    int64_t n = c.src_len < c.dst_cap ? c.src_len : c.dst_cap;
    std::memcpy(dst + c.dst_off, raw + c.src_off, static_cast<size_t>(n));
    return 0;
  }
  if (compression == 32773)
    return decode_packbits(raw + c.src_off, c.src_len, dst + c.dst_off,
                           c.dst_cap);
  if (compression == 5)
    return decode_lzw(raw + c.src_off, c.src_len, dst + c.dst_off, c.dst_cap);
  // deflate (8) / legacy deflate (32946)
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -1;
  zs.next_in = const_cast<Bytef*>(raw + c.src_off);
  zs.avail_in = static_cast<uInt>(c.src_len);
  zs.next_out = dst + c.dst_off;
  zs.avail_out = static_cast<uInt>(c.dst_cap);
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  // Z_OK / Z_BUF_ERROR mean the stream was truncated or the output
  // filled early — silent zero-fill, not success.  Only a completed
  // stream counts; anything else must surface so the caller can fall
  // back to the strict Python zlib path or fail loudly.
  return rc == Z_STREAM_END ? 0 : -2;
}

}  // namespace

extern "C" {

// Decompress n_chunks chunks in parallel.  Returns 0 on success, the
// first nonzero per-chunk error otherwise.  compression: 1 = none,
// 5 = LZW, 8 / 32946 = zlib deflate, 32773 = PackBits.
int decode_chunks(const uint8_t* raw, const int64_t* src_offsets,
                  const int64_t* src_lengths, const int64_t* dst_offsets,
                  const int64_t* dst_caps, int64_t n_chunks, int compression,
                  uint8_t* dst, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 64) n_threads = 64;
  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_chunks || err.load() != 0) return;
      Chunk c{src_offsets[i], src_lengths[i], dst_offsets[i], dst_caps[i]};
      int rc = decode_one(raw, dst, c, compression);
      if (rc != 0) err.store(rc);
    }
  };
  std::vector<std::thread> pool;
  int n = static_cast<int>(n_chunks < n_threads ? n_chunks : n_threads);
  pool.reserve(static_cast<size_t>(n));
  for (int t = 0; t < n; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return err.load();
}

// Raw-deflate a buffer (GeoTIFF writer fast path).  Returns compressed
// size, or -1 if the output buffer is too small / zlib failed.
int64_t compress_buffer(const uint8_t* src, int64_t src_len, uint8_t* dst,
                        int64_t dst_cap, int level) {
  uLongf out_len = static_cast<uLongf>(dst_cap);
  int rc = compress2(dst, &out_len, src, static_cast<uLong>(src_len), level);
  return rc == Z_OK ? static_cast<int64_t>(out_len) : -1;
}

}  // extern "C"
