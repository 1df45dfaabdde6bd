/* Minimal serial stub of the ForkUnion C API — just enough to compile the
 * reference's stringzillas/types.hpp on a host without the submodule.
 * Every "parallel" loop runs serially on the caller thread; the baseline
 * harness only instantiates dummy_executor_t anyway, and the CI host has
 * one core, so serial IS the reference's best schedule here. */
#ifndef FORKUNION_STUB_H_
#define FORKUNION_STUB_H_

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef void *fu_topology_t;
typedef void *fu_pool_t;
typedef void *fu_lambda_context_t;
typedef void (*fu_for_n_lambda_t)(fu_lambda_context_t, size_t task, size_t thread, size_t colocation);
typedef void (*fu_for_slices_lambda_t)(fu_lambda_context_t, size_t first, size_t count, size_t thread,
                                       size_t colocation);

enum { fu_capabilities_all_k = 0, fu_caller_inclusive_k = 1 };

static inline fu_topology_t fu_topology_new(void) { return (fu_topology_t)1; }
static inline void fu_topology_delete(fu_topology_t t) { (void)t; }
static inline size_t fu_logical_cores_count(fu_topology_t t) { (void)t; return 1; }
static inline fu_pool_t fu_pool_new(char const *name, int caps) { (void)name; (void)caps; return (fu_pool_t)1; }
static inline void fu_pool_delete(fu_pool_t p) { (void)p; }
static inline int fu_pool_spawn(fu_topology_t t, fu_pool_t p, size_t threads, int mode) {
    (void)t; (void)p; (void)threads; (void)mode; return 1;
}
static inline size_t fu_pool_threads_count(fu_pool_t p) { (void)p; return 1; }
static inline void fu_pool_for_n(fu_pool_t p, size_t n, fu_lambda_context_t ctx, fu_for_n_lambda_t fn) {
    (void)p; for (size_t i = 0; i < n; ++i) fn(ctx, i, 0, 0);
}
static inline void fu_pool_for_n_dynamic(fu_pool_t p, size_t n, fu_lambda_context_t ctx, fu_for_n_lambda_t fn) {
    (void)p; for (size_t i = 0; i < n; ++i) fn(ctx, i, 0, 0);
}
static inline void fu_pool_for_slices(fu_pool_t p, size_t n, fu_lambda_context_t ctx, fu_for_slices_lambda_t fn) {
    (void)p; if (n) fn(ctx, 0, n, 0, 0);
}
static inline void fu_pool_for_threads(fu_pool_t p, fu_lambda_context_t ctx, fu_for_n_lambda_t fn) {
    (void)p; fn(ctx, 0, 0, 0);
}
static inline void fu_pool_sleep(fu_pool_t p, size_t micros) { (void)p; (void)micros; }

#ifdef __cplusplus
}
#endif

#endif /* FORKUNION_STUB_H_ */
