// Native passage store: fast jsonl ingestion + mmap'd id->record lookup.
//
// Host-side runtime component of jsa_rag_tpu. The reference keeps ~21M
// passages as Python dicts per rank (src/index.py:51 doc_map; loading via
// json.loads per line, src/index_io.py:17-47) and even pickles them through
// NCCL (src/index.py:34-41). Here the device program only ever emits int32
// passage ids; this store resolves id -> {id,title,text} from an mmap'd
// binary file with O(1) offset lookup and near-zero per-process memory.
//
// Binary layout (little-endian):
//   magic  "JPS1"            4 bytes
//   count  u64
//   offsets u64[count + 1]   byte offsets of records from file start
//   records: per record, three u32-length-prefixed utf-8 strings:
//            id, title, text
//
// Exposed as a C ABI for ctypes (pybind11 is not available in this image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[4] = {'J', 'P', 'S', '1'};

// --- minimal JSON string-field extractor -----------------------------------
// Extracts the string value of `key` from one JSON object line. Handles the
// standard escapes incl. \uXXXX (+ surrogate pairs). Returns false if the
// key is missing or not a string.
bool extract_string_field(const char* line, size_t len, const char* key,
                          std::string* out) {
  const size_t key_len = strlen(key);
  const char* p = line;
  const char* end = line + len;
  while (p < end) {
    // find "key"
    const char* q = (const char*)memchr(p, '"', end - p);
    if (!q) return false;
    ++q;
    if ((size_t)(end - q) > key_len && memcmp(q, key, key_len) == 0 &&
        q[key_len] == '"') {
      const char* r = q + key_len + 1;
      while (r < end && (*r == ' ' || *r == '\t')) ++r;
      if (r >= end || *r != ':') { p = q; continue; }
      ++r;
      while (r < end && (*r == ' ' || *r == '\t')) ++r;
      if (r >= end || *r != '"') { p = q; continue; }
      ++r;
      out->clear();
      while (r < end && *r != '"') {
        if (*r == '\\' && r + 1 < end) {
          ++r;
          switch (*r) {
            case 'n': out->push_back('\n'); break;
            case 't': out->push_back('\t'); break;
            case 'r': out->push_back('\r'); break;
            case 'b': out->push_back('\b'); break;
            case 'f': out->push_back('\f'); break;
            case '/': out->push_back('/'); break;
            case '"': out->push_back('"'); break;
            case '\\': out->push_back('\\'); break;
            case 'u': {
              if (r + 4 >= end) return false;
              unsigned cp = 0;
              for (int i = 1; i <= 4; ++i) {
                char c = r[i];
                cp <<= 4;
                if (c >= '0' && c <= '9') cp |= c - '0';
                else if (c >= 'a' && c <= 'f') cp |= c - 'a' + 10;
                else if (c >= 'A' && c <= 'F') cp |= c - 'A' + 10;
                else return false;
              }
              r += 4;
              // surrogate pair
              if (cp >= 0xD800 && cp <= 0xDBFF && r + 6 < end &&
                  r[1] == '\\' && r[2] == 'u') {
                unsigned lo = 0;
                bool ok = true;
                for (int i = 3; i <= 6; ++i) {
                  char c = r[i];
                  lo <<= 4;
                  if (c >= '0' && c <= '9') lo |= c - '0';
                  else if (c >= 'a' && c <= 'f') lo |= c - 'a' + 10;
                  else if (c >= 'A' && c <= 'F') lo |= c - 'A' + 10;
                  else { ok = false; break; }
                }
                if (ok && lo >= 0xDC00 && lo <= 0xDFFF) {
                  cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
                  r += 6;
                }
              }
              // utf-8 encode
              if (cp < 0x80) out->push_back((char)cp);
              else if (cp < 0x800) {
                out->push_back((char)(0xC0 | (cp >> 6)));
                out->push_back((char)(0x80 | (cp & 0x3F)));
              } else if (cp < 0x10000) {
                out->push_back((char)(0xE0 | (cp >> 12)));
                out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
                out->push_back((char)(0x80 | (cp & 0x3F)));
              } else {
                out->push_back((char)(0xF0 | (cp >> 18)));
                out->push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
                out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
                out->push_back((char)(0x80 | (cp & 0x3F)));
              }
              break;
            }
            default: out->push_back(*r); break;
          }
          ++r;
        } else {
          out->push_back(*r);
          ++r;
        }
      }
      return r < end;
    }
    // skip the rest of this string token to avoid matching inside values
    while (q < end && *q != '"') {
      if (*q == '\\') ++q;
      ++q;
    }
    p = q + 1;
  }
  return false;
}

void put_u32(std::string* buf, uint32_t v) {
  buf->append(reinterpret_cast<const char*>(&v), 4);
}

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t count = 0;
  const uint64_t* offsets = nullptr;
};

}  // namespace

extern "C" {

// Build the binary store from a jsonl corpus. Lines are kept in file order
// (global passage id = line number, matching the framework's id space).
// Returns the record count, or -1 on error.
long ps_build_from_jsonl(const char* jsonl_path, const char* out_path) {
  FILE* in = fopen(jsonl_path, "rb");
  if (!in) return -1;
  FILE* out = fopen(out_path, "wb");
  if (!out) { fclose(in); return -1; }

  std::vector<uint64_t> offsets;
  std::string payload_chunk;
  std::string id, title, text;

  // first pass streams records into a temp payload file while collecting
  // offsets; header+offsets are prepended afterwards.
  std::string tmp_path = std::string(out_path) + ".payload";
  FILE* payload = fopen(tmp_path.c_str(), "wb+");
  if (!payload) { fclose(in); fclose(out); return -1; }

  char* line = nullptr;
  size_t cap = 0;
  ssize_t n;
  uint64_t pos = 0;
  long count = 0;
  while ((n = getline(&line, &cap, in)) != -1) {
    // keep a record for EVERY line (even blank/malformed ones become
    // empty-string records): skipping would shift all later ids off the
    // "global passage id = line number" contract the header documents
    id.clear(); title.clear(); text.clear();
    extract_string_field(line, (size_t)n, "id", &id);
    extract_string_field(line, (size_t)n, "title", &title);
    extract_string_field(line, (size_t)n, "text", &text);
    payload_chunk.clear();
    put_u32(&payload_chunk, (uint32_t)id.size());
    payload_chunk += id;
    put_u32(&payload_chunk, (uint32_t)title.size());
    payload_chunk += title;
    put_u32(&payload_chunk, (uint32_t)text.size());
    payload_chunk += text;
    offsets.push_back(pos);
    fwrite(payload_chunk.data(), 1, payload_chunk.size(), payload);
    pos += payload_chunk.size();
    ++count;
  }
  free(line);
  offsets.push_back(pos);
  fclose(in);

  // header
  uint64_t cnt = (uint64_t)count;
  uint64_t header_size = 4 + 8 + 8 * offsets.size();
  for (auto& o : offsets) o += header_size;
  fwrite(kMagic, 1, 4, out);
  fwrite(&cnt, 8, 1, out);
  fwrite(offsets.data(), 8, offsets.size(), out);
  // append payload
  rewind(payload);
  char buf[1 << 20];
  size_t r;
  while ((r = fread(buf, 1, sizeof(buf), payload)) > 0)
    fwrite(buf, 1, r, out);
  fclose(payload);
  remove(tmp_path.c_str());
  fclose(out);
  return count;
}

void* ps_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) { close(fd); return nullptr; }
  const uint8_t* b = (const uint8_t*)base;
  if (st.st_size < 12 || memcmp(b, kMagic, 4) != 0) {
    munmap(base, st.st_size);
    close(fd);
    return nullptr;
  }
  uint64_t count;
  memcpy(&count, b + 4, 8);
  // bounds-validate before trusting the header: a truncated/corrupt file
  // (e.g. interrupted build) must fail cleanly, not SIGBUS on first read
  uint64_t header = 4 + 8 + 8 * (count + 1);
  if (count > ((uint64_t)st.st_size) / 8 ||
      (uint64_t)st.st_size < header) {
    munmap(base, st.st_size);
    close(fd);
    return nullptr;
  }
  const uint64_t* offs = reinterpret_cast<const uint64_t*>(b + 12);
  if (offs[0] != header || offs[count] != (uint64_t)st.st_size) {
    munmap(base, st.st_size);
    close(fd);
    return nullptr;
  }
  Store* s = new Store();
  s->fd = fd;
  s->base = b;
  s->size = st.st_size;
  s->count = count;
  s->offsets = offs;
  return s;
}

long ps_count(void* h) {
  return h ? (long)((Store*)h)->count : -1;
}

// Returns pointers into the mmap (valid until ps_close). 0 on success.
int ps_get(void* h, long idx, const char** id, long* id_len,
           const char** title, long* title_len, const char** text,
           long* text_len) {
  Store* s = (Store*)h;
  if (!s || idx < 0 || (uint64_t)idx >= s->count) return -1;
  const uint8_t* p = s->base + s->offsets[idx];
  uint32_t l;
  memcpy(&l, p, 4); p += 4;
  *id = (const char*)p; *id_len = l; p += l;
  memcpy(&l, p, 4); p += 4;
  *title = (const char*)p; *title_len = l; p += l;
  memcpy(&l, p, 4); p += 4;
  *text = (const char*)p; *text_len = l;
  return 0;
}

void ps_close(void* h) {
  Store* s = (Store*)h;
  if (!s) return;
  munmap((void*)s->base, s->size);
  close(s->fd);
  delete s;
}

}  // extern "C"
