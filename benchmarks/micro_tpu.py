"""TPU microbenchmarks for primitive costs the kernel designs depend on.

All loops run INSIDE one jit'd fori_loop with a data dependency chained
through every iteration (async dispatch pipelines top-level python loops and
single-shot timings are floored by the ~2-4 ms tunnel dispatch — both
produce garbage numbers; see CLAUDE.md).
"""

import json
import sys
import time

sys.path.insert(0, ".")


def timed_fori(make_body, x0, iters=20):
    import jax

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: make_body(v), x)

    y = loop(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = loop(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    out = {"device": str(jax.devices()[0])}
    key = jax.random.PRNGKey(0)
    m = 50_000

    keys0 = jax.random.randint(key, (m,), 0, 1 << 20, jnp.int32)
    out["argsort_50k_ms"] = timed_fori(
        lambda k: k + jnp.argsort(k).astype(jnp.int32), keys0)

    vals = jax.random.normal(key, (m,), jnp.float32)
    out["sort_kv_50k_ms"] = timed_fori(
        lambda k: k + jax.lax.sort_key_val(k, vals)[1].astype(jnp.int32), keys0)

    tex = jax.random.normal(key, (1024, 1024), jnp.float32)
    idx5 = jax.random.randint(key, (m,), 0, 1024 * 1024, jnp.int32)
    out["gather_50k_from_4mb_ms"] = timed_fori(
        lambda i: (i + jnp.take(tex.reshape(-1), i).astype(jnp.int32)) % (1024 * 1024),
        idx5)

    idx36 = jax.random.randint(key, (36_000_000,), 0, 1024 * 1024, jnp.int32)
    out["gather_36m_ms"] = timed_fori(
        lambda i: (i + jnp.take(tex.reshape(-1), i).astype(jnp.int32)) % (1024 * 1024),
        idx36, iters=3)

    texr = tex.reshape(8192, 128)
    idxr = jax.random.randint(key, (1_000_000,), 0, 8192, jnp.int32)
    out["rowgather_1m_x128_ms"] = timed_fori(
        lambda i: (i + jnp.take(texr, i, axis=0)[:, 0].astype(jnp.int32)) % 8192,
        idxr, iters=5)

    out["scatter_add_50k_ms"] = timed_fori(
        lambda i: (i + jnp.zeros((1024 * 1024,), jnp.float32)
                   .at[i].add(1.0)[0].astype(jnp.int32)) % (1024 * 1024),
        idx5)

    # batched one-hot style matmuls at the spread-kernel shape:
    # 196 tiles x (256, 512) @ (512, 256)
    w8 = jax.random.randint(key, (196, 256, 512), -127, 127, jnp.int8)
    h8 = jax.random.randint(key, (196, 512, 256), 0, 2, jnp.int8)

    def bmm_int8(x):
        lhs = w8.at[0, 0, 0].set((x & 63).astype(jnp.int8))
        y = jax.lax.dot_general(
            lhs, h8, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        return y[0, 0, 0]

    out["bmm_int8_196x256x512x256_ms"] = timed_fori(bmm_int8, jnp.int32(0))

    wb = w8.astype(jnp.bfloat16)
    hb = h8.astype(jnp.bfloat16)

    def bmm_bf16(x):
        lhs = wb.at[0, 0, 0].set(x.astype(jnp.bfloat16) * 1e-9)
        y = jax.lax.dot_general(
            lhs, hb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return y[0, 0, 0].astype(jnp.int32)

    out["bmm_bf16_196x256x512x256_ms"] = timed_fori(bmm_bf16, jnp.int32(0))

    # elementwise compare volume of the spread one-hot builds:
    # (141k pairs x 512 cols x 256 lanes) int compares ~ modeled by one big op
    def onehot_build(x):
        big = jax.lax.broadcasted_iota(jnp.int32, (141_000, 512), 1) * 7 % 513
        oh = (big == (x % 512)).astype(jnp.int8)
        return x + oh[0, 0].astype(jnp.int32) + oh.sum(dtype=jnp.int32) % 7

    out["compare_72m_int_ms"] = timed_fori(onehot_build, jnp.int32(0), iters=10)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
