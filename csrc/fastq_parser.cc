// Native FASTQ chunk parser: the host-side hot path of the input pipeline.
//
// The reference parses FASTQ with a C++ 4-line state machine
// (FASTQsequence.h:129-165) over safeGetline (sequenceTools.h:45-73).
// This module is its equivalent for the TPU framework's columnar batches:
// it parses a chunk of records straight into caller-provided fixed-shape
// buffers (bases/quality uint8 [max_reads, pad_len], lengths int32,
// names char[max_reads, name_cap]), so Python never touches per-read
// strings on the hot path.  Line scanning is block-buffered memchr.
//
// Identifier cleaning mirrors FASTQsequence.h:61-71: drop the leading '@',
// truncate at the first space, then truncate at the first '/'.
//
// The parser is resumable: the caller passes a byte offset that is updated
// to the position after the last fully-consumed record, which also gives
// the chunked --num-reads-at-once loop (SLAM.h:194-251) a natural
// checkpoint cursor.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Block-buffered reader with memchr line scanning (~GB/s vs ~100MB/s for
// byte-at-a-time stdio).
class LineReader {
 public:
  explicit LineReader(FILE* f) : f_(f), buf_(1 << 20), pos_(0), len_(0) {}

  // Raw line without the trailing '\n' (a '\r' is retained); *bytes is the
  // exact number of stream bytes consumed.  Returns false at EOF.
  bool getline_raw(std::string* out, size_t* bytes) {
    out->clear();
    bool any = false, newline = false;
    while (!newline) {
      if (pos_ == len_) {
        len_ = std::fread(buf_.data(), 1, buf_.size(), f_);
        pos_ = 0;
        if (len_ == 0) break;
      }
      any = true;
      const char* base = buf_.data() + pos_;
      const char* nl = static_cast<const char*>(
          std::memchr(base, '\n', len_ - pos_));
      if (nl == nullptr) {
        out->append(base, len_ - pos_);
        pos_ = len_;
      } else {
        out->append(base, static_cast<size_t>(nl - base));
        pos_ += static_cast<size_t>(nl - base) + 1;
        newline = true;
      }
    }
    *bytes = out->size() + (newline ? 1 : 0);
    return any;
  }

  // CRLF-safe line + byte accounting.
  bool getline(std::string* out, size_t* bytes) {
    if (!getline_raw(out, bytes)) return false;
    if (!out->empty() && out->back() == '\r') out->pop_back();
    return true;
  }

 private:
  FILE* f_;
  std::vector<char> buf_;
  size_t pos_, len_;
};

}  // namespace

extern "C" {

// Returns the number of records parsed (>= 0), or -1 if the file cannot
// be opened/seeked.  *offset_inout advances past consumed records.
// Records whose read length exceeds pad_len are truncated (length is
// clamped); name_cap includes the terminating NUL.
int64_t kslam_fastq_parse_chunk(const char* path, int64_t* offset_inout,
                                int64_t max_reads, int32_t pad_len,
                                uint8_t* bases, uint8_t* quality,
                                int32_t* lengths, char* names,
                                int32_t name_cap) {
  FILE* f = std::fopen(path, "rb");
  if (f == nullptr) return -1;
  if (std::fseek(f, static_cast<long>(*offset_inout), SEEK_SET) != 0) {
    std::fclose(f);
    return -1;
  }
  LineReader reader(f);
  std::string id_line, seq, plus, qual;
  size_t b1, b2, b3, b4;
  int64_t n = 0;
  int64_t consumed = *offset_inout;
  while (n < max_reads) {
    if (!reader.getline(&id_line, &b1)) break;
    if (!reader.getline(&seq, &b2)) break;
    if (!reader.getline(&plus, &b3)) break;
    if (!reader.getline(&qual, &b4)) break;

    // identifier: skip '@', cut at first space, cut at first '/'
    const char* id = id_line.c_str();
    size_t id_len = id_line.size();
    size_t start = 1;  // the '@' (FASTQsequence.h always drops char 0)
    size_t end = id_len;
    for (size_t i = start; i < id_len; i++) {
      if (id[i] == ' ') { end = i; break; }
    }
    for (size_t i = start; i < end; i++) {
      if (id[i] == '/') { end = i; break; }
    }
    size_t name_len = (id_len >= start) ? end - start : 0;
    if (name_len >= static_cast<size_t>(name_cap)) {
      name_len = static_cast<size_t>(name_cap) - 1;
    }
    char* name_dst = names + n * name_cap;
    std::memcpy(name_dst, id + start, name_len);
    name_dst[name_len] = '\0';

    size_t blen = seq.size() < static_cast<size_t>(pad_len)
                      ? seq.size()
                      : static_cast<size_t>(pad_len);
    uint8_t* brow = bases + n * pad_len;
    uint8_t* qrow = quality + n * pad_len;
    std::memset(brow, 0, static_cast<size_t>(pad_len));
    std::memset(qrow, 0, static_cast<size_t>(pad_len));
    std::memcpy(brow, seq.data(), blen);
    size_t qlen = qual.size() < static_cast<size_t>(pad_len)
                      ? qual.size()
                      : static_cast<size_t>(pad_len);
    std::memcpy(qrow, qual.data(), qlen);
    lengths[n] = static_cast<int32_t>(blen);

    n++;
    consumed += static_cast<int64_t>(b1 + b2 + b3 + b4);
    *offset_inout = consumed;
  }
  std::fclose(f);
  return n;
}

// Writes a batch back to FASTQ (writeReadsToFASTQ, FASTQsequence.h:100-107).
// Returns 0 on success.
int32_t kslam_fastq_write(const char* path, int64_t num_reads,
                          int32_t pad_len, const uint8_t* bases,
                          const uint8_t* quality, const int32_t* lengths,
                          const char* names, int32_t name_cap,
                          int32_t append) {
  FILE* f = std::fopen(path, append ? "ab" : "wb");
  if (f == nullptr) return -1;
  for (int64_t i = 0; i < num_reads; i++) {
    std::fputc('@', f);
    std::fputs(names + i * name_cap, f);
    std::fputc('\n', f);
    std::fwrite(bases + i * pad_len, 1, static_cast<size_t>(lengths[i]), f);
    std::fputs("\n+\n", f);
    std::fwrite(quality + i * pad_len, 1, static_cast<size_t>(lengths[i]), f);
    std::fputc('\n', f);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
