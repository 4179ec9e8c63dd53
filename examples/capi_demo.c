/* dlopen consumer for libbert.so — proves the C-ABI surface is loadable
 * with no headers or link-time deps, like the reference's dlopen skeleton
 * (examples/dylib.cpp:5-16: dlsym of load/encode/n_embd).
 *
 * Build & run:
 *   make -C csrc libbert.so
 *   gcc -O2 -o /tmp/capi_demo examples/capi_demo.c -ldl
 *   /tmp/capi_demo csrc/libbert.so model.bin "first text" "second text"
 */
#include <dlfcn.h>
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

typedef struct bert_ctx bert_ctx;

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s <libbert.so> <model.bin> <text1> <text2>\n",
                argv[0]);
        return 2;
    }
    void *lib = dlopen(argv[1], RTLD_NOW);
    if (!lib) {
        fprintf(stderr, "dlopen: %s\n", dlerror());
        return 1;
    }
    bert_ctx *(*load)(const char *) =
        (bert_ctx * (*)(const char *)) dlsym(lib, "bert_load_from_file");
    void (*free_ctx)(bert_ctx *) = (void (*)(bert_ctx *))dlsym(lib, "bert_free");
    void (*encode)(bert_ctx *, int32_t, const char *, float *) =
        (void (*)(bert_ctx *, int32_t, const char *, float *))dlsym(
            lib, "bert_encode");
    int32_t (*n_embd_fn)(bert_ctx *) =
        (int32_t(*)(bert_ctx *))dlsym(lib, "bert_n_embd");
    if (!load || !free_ctx || !encode || !n_embd_fn) {
        fprintf(stderr, "dlsym failed\n");
        return 1;
    }

    bert_ctx *ctx = load(argv[2]);
    if (!ctx) {
        fprintf(stderr, "load failed\n");
        return 1;
    }
    int32_t n = n_embd_fn(ctx);
    printf("n_embd = %d\n", n);

    float *a = malloc(sizeof(float) * (size_t)n);
    float *b = malloc(sizeof(float) * (size_t)n);
    encode(ctx, 6, argv[3], a);
    encode(ctx, 6, argv[4], b);

    double dot = 0.0;
    for (int32_t i = 0; i < n; ++i) dot += (double)a[i] * (double)b[i];
    printf("cosine(text1, text2) = %.4f\n", dot);

    free(a);
    free(b);
    free_ctx(ctx);
    dlclose(lib);
    return 0;
}
