// mqtpu native runtime: SentencePiece-style BPE tokenizer + samplers.
//
// TPU-native analogue of the reference's C++ on-device runtime pieces that are
// not XLA's job (capp/src/llm.cpp: tokenizer :31-242, sampler :268-317,656-682).
// Fresh design, not a port:
//   * tokenizer.bin v1 (llama2.c layout: u32 max_token_len, then per token
//     {f32 score, u32 len, bytes}) is read by streaming to EOF — no external
//     vocab_size needed; v2 ("MQTK" magic + u32 vocab_size) is self-describing.
//   * merge candidates use an O(1) hash map instead of qsort/bsearch.
//   * samplers: argmax / temperature-multinomial / nucleus (top-p) / top-k,
//     xoshiro256** RNG (the reference stubs top-p and uses xorshift).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image). Thread-safety: each
// handle is independently usable from one thread; no globals besides the
// per-thread error string and the log level.
//
// mqtpu_session_*: the analogue of the reference's libllmod C API
// (capp/api/libllmod.h:42-133 setup/run/ref/release, capp/src/errors.{h,cpp}
// per-context error table, capp/src/logging.{h,cpp} levels, and the llm.cpp
// generate() orchestration): a ref-counted, magic-validated session owning the
// tokenizer + sampler + chat template that drives an autoregressive decode
// loop through a caller-supplied forward callback. On the reference the
// callback role is played by the QNN graph execute; here it is the compiled
// XLA decode step (bridged from Python via ctypes, or any C host that owns a
// PJRT executable).

#include <algorithm>
#include <cmath>
#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <numeric>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

// leveled logging (reference logging.h NOTHING/ERROR/INFO/DEBUG/ABUSIVE)
int g_log_level = 1;  // ERROR

void logmsg(int lvl, const char* fmt, ...) {
    if (lvl > g_log_level) return;
    static const char* names[] = {"-", "E", "I", "D", "A"};
    std::fprintf(stderr, "[mqtpu:%s] ", names[lvl < 0 ? 0 : (lvl > 4 ? 4 : lvl)]);
    va_list ap;
    va_start(ap, fmt);
    std::vfprintf(stderr, fmt, ap);
    va_end(ap);
    std::fprintf(stderr, "\n");
}

// ---------------------------------------------------------------------------
// Tokenizer
// ---------------------------------------------------------------------------

struct Tokenizer {
    std::vector<std::string> pieces;
    std::vector<float> scores;
    std::unordered_map<std::string, int32_t> lookup;
    uint32_t max_token_len = 0;
    // byte-fallback base: pieces "<0xXX>" map bytes; llama-family vocabs place
    // them at ids 3..258
    int32_t byte_base = -1;
    std::string decode_buf;

    bool load(const char* path) {
        FILE* f = std::fopen(path, "rb");
        if (!f) { set_error(std::string("cannot open ") + path); return false; }
        char magic[4] = {0};
        if (std::fread(magic, 1, 4, f) != 4) {
            std::fclose(f); set_error("truncated tokenizer file"); return false;
        }
        uint32_t vocab_size = 0;
        bool v2 = std::memcmp(magic, "MQTK", 4) == 0;
        if (v2) {
            if (std::fread(&vocab_size, 4, 1, f) != 1 ||
                std::fread(&max_token_len, 4, 1, f) != 1) {
                std::fclose(f); set_error("truncated v2 header"); return false;
            }
        } else {
            // v1: the 4 bytes we read were max_token_len
            std::memcpy(&max_token_len, magic, 4);
        }
        while (true) {
            float score;
            uint32_t len;
            if (std::fread(&score, 4, 1, f) != 1) break;   // EOF
            if (std::fread(&len, 4, 1, f) != 1 || len > (1u << 20)) {
                std::fclose(f); set_error("corrupt token record"); return false;
            }
            std::string piece(len, '\0');
            if (len && std::fread(piece.data(), 1, len, f) != len) {
                std::fclose(f); set_error("truncated token bytes"); return false;
            }
            scores.push_back(score);
            pieces.push_back(std::move(piece));
            if (v2 && pieces.size() == vocab_size) break;
        }
        std::fclose(f);
        lookup.reserve(pieces.size() * 2);
        for (size_t i = 0; i < pieces.size(); ++i)
            lookup.emplace(pieces[i], static_cast<int32_t>(i));
        // locate byte-fallback block
        auto it = lookup.find("<0x00>");
        if (it != lookup.end()) byte_base = it->second;
        return true;
    }

    int32_t find(const std::string& s) const {
        auto it = lookup.find(s);
        return it == lookup.end() ? -1 : it->second;
    }

    // greedy highest-score pair merging over UTF-8 codepoint seeds
    int encode(const char* text, int32_t* out, int max_out) const {
        std::vector<int32_t> toks;
        const auto* p = reinterpret_cast<const unsigned char*>(text);
        std::string cp;
        while (*p) {
            cp.clear();
            cp.push_back(static_cast<char>(*p));
            // gather UTF-8 continuation bytes (cap at 4)
            while ((p[1] & 0xC0) == 0x80 && cp.size() < 4) {
                ++p;
                cp.push_back(static_cast<char>(*p));
            }
            ++p;
            int32_t id = find(cp);
            if (id >= 0) {
                toks.push_back(id);
            } else if (byte_base >= 0) {
                for (unsigned char b : cp)
                    toks.push_back(byte_base + b);
            }  // no byte fallback block: drop unknown codepoint
        }
        // iterative best-scoring merge
        while (toks.size() >= 2) {
            float best_score = -1e30f;
            int32_t best_id = -1;
            size_t best_at = 0;
            for (size_t i = 0; i + 1 < toks.size(); ++i) {
                const std::string cat = pieces[toks[i]] + pieces[toks[i + 1]];
                int32_t id = find(cat);
                if (id >= 0 && scores[id] > best_score) {
                    best_score = scores[id];
                    best_id = id;
                    best_at = i;
                }
            }
            if (best_id < 0) break;
            toks[best_at] = best_id;
            toks.erase(toks.begin() + best_at + 1);
        }
        int n = std::min<int>(toks.size(), max_out);
        std::copy(toks.begin(), toks.begin() + n, out);
        return static_cast<int>(toks.size());
    }

    const char* decode(int32_t token) {
        if (token < 0 || token >= static_cast<int32_t>(pieces.size())) return "";
        const std::string& piece = pieces[token];
        if (byte_base >= 0 && token >= byte_base && token < byte_base + 256 &&
            piece.size() == 6 && piece.rfind("<0x", 0) == 0) {
            decode_buf.assign(1, static_cast<char>(token - byte_base));
            return decode_buf.c_str();
        }
        return piece.c_str();
    }
};

// ---------------------------------------------------------------------------
// Sampler
// ---------------------------------------------------------------------------

struct Sampler {
    uint64_t s[4];
    float temperature;
    float top_p;
    int top_k;
    std::vector<int> idx;

    explicit Sampler(uint64_t seed, float temp, float tp, int tk)
        : temperature(temp), top_p(tp), top_k(tk) {
        // splitmix64 seeding of xoshiro256**
        uint64_t z = seed + 0x9E3779B97F4A7C15ull;
        for (auto& si : s) {
            z += 0x9E3779B97F4A7C15ull;
            uint64_t x = z;
            x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
            x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
            si = x ^ (x >> 31);
        }
    }

    static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }

    uint64_t next() {
        uint64_t result = rotl(s[1] * 5, 7) * 9;
        uint64_t t = s[1] << 17;
        s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3];
        s[2] ^= t; s[3] = rotl(s[3], 45);
        return result;
    }

    float uniform() { return (next() >> 11) * (1.0f / 9007199254740992.0f); }

    int sample(const float* logits, int n) {
        if (temperature <= 0.0f)
            return static_cast<int>(std::max_element(logits, logits + n) - logits);

        idx.resize(n);
        std::iota(idx.begin(), idx.end(), 0);
        int cand = n;
        if (top_k > 0 && top_k < n) {
            std::partial_sort(idx.begin(), idx.begin() + top_k, idx.end(),
                              [&](int a, int b) { return logits[a] > logits[b]; });
            cand = top_k;
        } else if (top_p < 1.0f) {
            std::sort(idx.begin(), idx.end(),
                      [&](int a, int b) { return logits[a] > logits[b]; });
        }

        // softmax over candidates at temperature
        std::vector<double> probs(cand);
        double mx = logits[idx[0]];
        for (int i = 0; i < cand; ++i) mx = std::max(mx, (double)logits[idx[i]]);
        double z = 0.0;
        for (int i = 0; i < cand; ++i) {
            probs[i] = std::exp(((double)logits[idx[i]] - mx) / temperature);
            z += probs[i];
        }
        if (top_p < 1.0f) {
            // nucleus: truncate to the smallest prefix with mass >= top_p
            double acc = 0.0;
            int cut = cand;
            for (int i = 0; i < cand; ++i) {
                acc += probs[i] / z;
                if (acc >= top_p) { cut = i + 1; break; }
            }
            cand = cut;
            z = 0.0;
            for (int i = 0; i < cand; ++i) z += probs[i];
        }
        double r = uniform() * z;
        double acc = 0.0;
        for (int i = 0; i < cand; ++i) {
            acc += probs[i];
            if (r <= acc) return idx[i];
        }
        return idx[cand - 1];
    }
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// Session: tokenizer + sampler + chat template + decode-loop orchestration
// ---------------------------------------------------------------------------

// forward callback: one token, one position -> logits[vocab]. Returns 0 on
// success (reference: QnnGraph execute, qnn_context.cpp:454-461).
typedef int32_t (*mqtpu_forward_fn)(void* user, int32_t token, int32_t position,
                                    float* logits_out);

enum MqtpuError {
    MQTPU_OK = 0,
    MQTPU_INVALID_HANDLE = 1,
    MQTPU_TOKENIZER_ERROR = 2,
    MQTPU_FORWARD_ERROR = 3,
    MQTPU_SEQ_OVERFLOW = 4,
    MQTPU_BAD_ARGS = 5,
};

constexpr uint32_t kSessionMagic = 0x5354514du;  // "MQTS"

struct Session {
    uint32_t magic = kSessionMagic;
    int32_t refcount = 1;
    Tokenizer tok;
    std::unique_ptr<Sampler> sampler;
    std::string family;
    int32_t bos_id = -1;
    int32_t eos_id = -1;
    int32_t max_seq_len = 0;
    mqtpu_forward_fn forward = nullptr;
    void* user = nullptr;
    std::vector<float> logits;
    // per-code error table (reference errors.cpp ErrorTable)
    std::unordered_map<int32_t, std::string> errors;

    void fail(int32_t code, const std::string& msg) {
        errors[code] = msg;
        set_error(msg);
        logmsg(1, "%s", msg.c_str());
    }
};

Session* session_cast(void* h) {
    auto* s = static_cast<Session*>(h);
    // magic-header validation (reference libllmod.cpp:50-65)
    if (!s || s->magic != kSessionMagic) {
        set_error("invalid session handle");
        return nullptr;
    }
    return s;
}

// Tokenized chat templates, hardcoded per family like the reference's
// token-id templates (llm.cpp:382-392). Special tokens resolve to ATOMIC
// vocab ids and the user prompt is tokenized as its own segment — string-
// level templating can shift ids at segment boundaries (sentencepiece
// prefix-space / cross-boundary merges), which is exactly why the reference
// hardcodes ids. Specials missing from the vocab fall back to text encoding
// so byte-fallback test vocabs still work. Mirrors runtime/chat.py
// TEMPLATE_SEGMENTS — keep the two specs in sync (pinned by
// tests/test_runtime_extras.py golden-id tests).
struct Seg { bool special; const char* s; };
struct TemplateSpec { std::vector<Seg> prefix, suffix; };

TemplateSpec template_spec(const std::string& family) {
    if (family == "llama")           // TinyLlama-1.1B-Chat (zephyr format)
        return {{{true, "<|system|>"}, {false, "\nYou are a friendly chatbot."},
                 {true, "</s>"}, {false, "\n"}, {true, "<|user|>"}, {false, "\n"}},
                {{true, "</s>"}, {false, "\n"}, {true, "<|assistant|>"},
                 {false, "\n"}}};
    if (family == "gemma")           // Gemma instruction format
        return {{{true, "<start_of_turn>"}, {false, "user\n"}},
                {{true, "<end_of_turn>"}, {false, "\n"},
                 {true, "<start_of_turn>"}, {false, "model\n"}}};
    if (family == "stablelm")        // StableLM-2 zephyr format
        return {{{true, "<|user|>"}, {false, "\n"}},
                {{true, "<|endoftext|>"}, {false, "\n"},
                 {true, "<|assistant|>"}, {false, "\n"}}};
    return {{}, {}};
}

bool encode_segments(const Tokenizer& tok, const std::vector<Seg>& segs,
                     std::vector<int32_t>& out) {
    for (const auto& g : segs) {
        if (g.special) {
            int32_t id = tok.find(g.s);
            if (id >= 0) { out.push_back(id); continue; }
        }
        std::vector<int32_t> tmp(std::strlen(g.s) + 8);
        int n = tok.encode(g.s, tmp.data(), static_cast<int>(tmp.size()));
        if (n < 0) return false;
        for (int i = 0; i < n && i < static_cast<int>(tmp.size()); ++i)
            out.push_back(tmp[i]);
    }
    return true;
}

// full templated token sequence for pre-tokenized prompt ids (no bos)
bool build_template_ids(const Tokenizer& tok, const std::string& family,
                        const int32_t* prompt_ids, int32_t n_prompt,
                        std::vector<int32_t>& out) {
    TemplateSpec spec = template_spec(family);
    if (!encode_segments(tok, spec.prefix, out)) return false;
    if (n_prompt > 0)
        out.insert(out.end(), prompt_ids, prompt_ids + n_prompt);
    return encode_segments(tok, spec.suffix, out);
}

int32_t session_run_ids(Session* s, const int32_t* prompt_ids,
                        int32_t n_prompt, char** text_out,
                        int32_t max_new_tokens, int32_t* last_pos_out) {
    // n_prompt == 0 is allowed: a chat template alone can prime generation
    // (the string path encodes "" to zero ids); emptiness after templating
    // is still rejected below
    if ((!prompt_ids && n_prompt > 0) || n_prompt < 0 || !text_out
        || max_new_tokens <= 0) {
        s->fail(MQTPU_BAD_ARGS, "bad arguments to mqtpu_session_run_ids");
        return MQTPU_BAD_ARGS;
    }
    std::vector<int32_t> tokens;
    if (!build_template_ids(s->tok, s->family, prompt_ids, n_prompt, tokens)) {
        s->fail(MQTPU_TOKENIZER_ERROR, "template encode failed: " + g_error);
        return MQTPU_TOKENIZER_ERROR;
    }
    if (s->bos_id >= 0) tokens.insert(tokens.begin(), s->bos_id);
    if (static_cast<int32_t>(tokens.size()) + max_new_tokens > s->max_seq_len) {
        s->fail(MQTPU_SEQ_OVERFLOW, "prompt + max_new_tokens exceeds max_seq_len");
        return MQTPU_SEQ_OVERFLOW;
    }
    logmsg(2, "prompt: %d tokens, generating up to %d",
           static_cast<int>(tokens.size()), max_new_tokens);

    if (tokens.empty()) {
        s->fail(MQTPU_BAD_ARGS, "empty prompt after tokenization");
        return MQTPU_BAD_ARGS;
    }
    // teacher-forced prompt phase then sampling, one token per step — the
    // reference runs prefill as repeated decode too (llm.cpp:601-633)
    std::string out_text;
    int32_t pos = 0;
    for (size_t i = 0; i + 1 < tokens.size(); ++i) {
        if (s->forward(s->user, tokens[i], pos, s->logits.data()) != 0) {
            s->fail(MQTPU_FORWARD_ERROR, "forward callback failed");
            return MQTPU_FORWARD_ERROR;
        }
        ++pos;
    }
    int32_t cur = tokens.back();
    for (int32_t i = 0; i < max_new_tokens; ++i) {
        if (s->forward(s->user, cur, pos, s->logits.data()) != 0) {
            s->fail(MQTPU_FORWARD_ERROR, "forward callback failed");
            return MQTPU_FORWARD_ERROR;
        }
        ++pos;
        cur = s->sampler->sample(s->logits.data(),
                                 static_cast<int>(s->logits.size()));
        if (cur == s->eos_id) break;
        out_text += s->tok.decode(cur);
        logmsg(3, "pos %d -> token %d", pos, cur);
    }
    *text_out = static_cast<char*>(std::malloc(out_text.size() + 1));
    std::memcpy(*text_out, out_text.c_str(), out_text.size() + 1);
    if (last_pos_out) *last_pos_out = pos;
    return MQTPU_OK;
}

// string entry point: tokenize the user prompt as its own segment, then the
// exact-id path — ids are identical whether the caller pre-tokenizes or not
int32_t session_run(Session* s, const char* prompt, char** text_out,
                    int32_t max_new_tokens, int32_t* last_pos_out) {
    if (!prompt || !text_out || max_new_tokens <= 0) {
        s->fail(MQTPU_BAD_ARGS, "bad arguments to mqtpu_session_run");
        return MQTPU_BAD_ARGS;
    }
    std::vector<int32_t> ids(std::strlen(prompt) + 8);
    int n = s->tok.encode(prompt, ids.data(), static_cast<int>(ids.size()));
    if (n < 0) {
        s->fail(MQTPU_TOKENIZER_ERROR, "tokenizer encode failed: " + g_error);
        return MQTPU_TOKENIZER_ERROR;
    }
    ids.resize(n);
    return session_run_ids(s, ids.data(), static_cast<int32_t>(ids.size()),
                           text_out, max_new_tokens, last_pos_out);
}

extern "C" {

const char* mqtpu_last_error() { return g_error.c_str(); }

void* mqtpu_tokenizer_load(const char* path) {
    auto t = std::make_unique<Tokenizer>();
    if (!t->load(path)) return nullptr;
    return t.release();
}

int mqtpu_tokenizer_vocab_size(void* tk) {
    return static_cast<int>(static_cast<Tokenizer*>(tk)->pieces.size());
}

int mqtpu_tokenizer_encode(void* tk, const char* text, int32_t* out, int max_out) {
    return static_cast<Tokenizer*>(tk)->encode(text, out, max_out);
}

const char* mqtpu_tokenizer_decode(void* tk, int32_t token) {
    return static_cast<Tokenizer*>(tk)->decode(token);
}

// exact-piece lookup (no merging): the atomic id of a special token, or -1
int32_t mqtpu_tokenizer_piece_to_id(void* tk, const char* piece) {
    return static_cast<Tokenizer*>(tk)->find(piece);
}

// tokenized chat template around pre-tokenized prompt ids (no bos). Returns
// the total id count (fills up to max_out), or -1 on encode failure.
int32_t mqtpu_template_ids(void* tk, const char* family,
                           const int32_t* prompt_ids, int32_t n_prompt,
                           int32_t* out, int32_t max_out) {
    auto* t = static_cast<Tokenizer*>(tk);
    if (!t || !family || (!prompt_ids && n_prompt > 0)) return -1;
    std::vector<int32_t> ids;
    if (!build_template_ids(*t, family, prompt_ids, n_prompt, ids)) return -1;
    int32_t n = std::min<int32_t>(static_cast<int32_t>(ids.size()), max_out);
    if (out) std::copy(ids.begin(), ids.begin() + n, out);
    return static_cast<int32_t>(ids.size());
}

void mqtpu_tokenizer_free(void* tk) { delete static_cast<Tokenizer*>(tk); }

void* mqtpu_sampler_new(uint64_t seed, float temperature, float top_p, int top_k) {
    return new Sampler(seed, temperature, top_p, top_k);
}

int mqtpu_sampler_sample(void* s, const float* logits, int n) {
    return static_cast<Sampler*>(s)->sample(logits, n);
}

void mqtpu_sampler_free(void* s) { delete static_cast<Sampler*>(s); }

void mqtpu_set_log_level(int level) { g_log_level = level; }

int32_t mqtpu_session_create(const char* tokenizer_path, const char* family,
                             float temperature, float top_p, int top_k,
                             uint64_t seed, int32_t max_seq_len,
                             int32_t vocab_size, int32_t bos_id, int32_t eos_id,
                             mqtpu_forward_fn forward, void* user,
                             void** out) {
    if (!tokenizer_path || !forward || !out || max_seq_len <= 0
        || vocab_size <= 0) {
        set_error("bad arguments to mqtpu_session_create");
        return MQTPU_BAD_ARGS;
    }
    auto s = std::make_unique<Session>();
    if (!s->tok.load(tokenizer_path)) return MQTPU_TOKENIZER_ERROR;
    s->sampler = std::make_unique<Sampler>(seed, temperature, top_p, top_k);
    s->family = family ? family : "none";
    s->bos_id = bos_id;
    s->eos_id = eos_id;
    s->max_seq_len = max_seq_len;
    s->forward = forward;
    s->user = user;
    s->logits.assign(static_cast<size_t>(vocab_size), 0.0f);
    logmsg(2, "session created (family=%s, vocab=%d, max_seq=%d)",
           s->family.c_str(), vocab_size, max_seq_len);
    *out = s.release();
    return MQTPU_OK;
}

int32_t mqtpu_session_ref(void* h) {
    Session* s = session_cast(h);
    if (!s) return MQTPU_INVALID_HANDLE;
    ++s->refcount;
    return MQTPU_OK;
}

int32_t mqtpu_session_release(void* h) {
    Session* s = session_cast(h);
    if (!s) return MQTPU_INVALID_HANDLE;
    if (--s->refcount == 0) {
        s->magic = 0;
        delete s;
    }
    return MQTPU_OK;
}

int32_t mqtpu_session_run(void* h, const char* prompt, char** text_out,
                          int32_t max_new_tokens, int32_t* last_pos_out) {
    Session* s = session_cast(h);
    if (!s) return MQTPU_INVALID_HANDLE;
    return session_run(s, prompt, text_out, max_new_tokens, last_pos_out);
}

// pre-tokenized entry point: the caller supplies exact prompt ids (avoids
// sentencepiece prefix-space drift entirely; ref llm.cpp:382-392 ships ids)
int32_t mqtpu_session_run_ids(void* h, const int32_t* prompt_ids,
                              int32_t n_prompt, char** text_out,
                              int32_t max_new_tokens, int32_t* last_pos_out) {
    Session* s = session_cast(h);
    if (!s) return MQTPU_INVALID_HANDLE;
    return session_run_ids(s, prompt_ids, n_prompt, text_out, max_new_tokens,
                           last_pos_out);
}

const char* mqtpu_session_error(void* h, int32_t code) {
    Session* s = session_cast(h);
    if (!s) return "invalid session handle";
    auto it = s->errors.find(code);
    return it == s->errors.end() ? "" : it->second.c_str();
}

void mqtpu_free_text(char* p) { std::free(p); }

}  // extern "C"
