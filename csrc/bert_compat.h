/* C API for bert_tpu — drop-in compatible with the reference's bert.h
 * (symbol names and signatures mirror /root/reference/bert.h:18-82 because
 * that surface IS the compatibility contract; the implementation is a
 * from-scratch client, csrc/bert_client.cpp).
 *
 * Semantics here: `bert_load_from_file(path)` spawns a `bert_tpu.server`
 * process for that model and connects to it (or, if `path` looks like
 * "host:port", connects to an already-running server). Tokenization and
 * vocab introspection run locally in this library (same native WordPiece
 * core as bert_tpu/native.py); evaluation crosses the wire protocol.
 * `n_threads` parameters are accepted and ignored — evaluation runs on a
 * TPU, not a thread pool.
 */
#ifndef BERT_TPU_COMPAT_H
#define BERT_TPU_COMPAT_H

#include <stdbool.h>
#include <stdint.h>

#define BERT_API __attribute__((visibility("default")))

#ifdef __cplusplus
extern "C" {
#endif

/* CLI parameter block, reference bert.h:18-27. */
struct bert_params {
    int32_t n_threads;   /* accepted for compatibility; unused */
    int32_t port;        /* server port */
    const char *model;   /* model path */
    const char *prompt;  /* text to embed */
};

BERT_API bool bert_params_parse(int argc, char **argv,
                                struct bert_params *params);

struct bert_ctx;
typedef int32_t bert_vocab_id;

BERT_API struct bert_ctx *bert_load_from_file(const char *fname);
BERT_API void bert_free(struct bert_ctx *ctx);

/* tokenize + evaluate (reference bert.h:38-52) */
BERT_API void bert_encode(struct bert_ctx *ctx, int32_t n_threads,
                          const char *texts, float *embeddings);
BERT_API void bert_encode_batch(struct bert_ctx *ctx, int32_t n_threads,
                                int32_t n_batch_size, int32_t n_inputs,
                                const char **texts, float **embeddings);

/* split pipeline (reference bert.h:56-77); bert_eval* send pre-tokenized
 * ids over the framed binary wire extension — exact, no re-tokenization. */
BERT_API void bert_tokenize(struct bert_ctx *ctx, const char *text,
                            bert_vocab_id *tokens, int32_t *n_tokens,
                            int32_t n_max_tokens);
BERT_API void bert_eval(struct bert_ctx *ctx, int32_t n_threads,
                        bert_vocab_id *tokens, int32_t n_tokens,
                        float *embeddings);
BERT_API void bert_eval_batch(struct bert_ctx *ctx, int32_t n_threads,
                              int32_t n_batch_size,
                              bert_vocab_id **batch_tokens, int32_t *n_tokens,
                              float **batch_embeddings);

BERT_API int32_t bert_n_embd(struct bert_ctx *ctx);
BERT_API int32_t bert_n_max_tokens(struct bert_ctx *ctx);
BERT_API const char *bert_vocab_id_to_token(struct bert_ctx *ctx,
                                            bert_vocab_id id);

#ifdef __cplusplus
}
#endif

#endif /* BERT_TPU_COMPAT_H */
