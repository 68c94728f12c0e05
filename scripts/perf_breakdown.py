"""Component-level perf breakdown on the real TPU.

Times the faithful train step (dropout 0.1) end-to-end, its fwd/bwd split,
and the bandwidth-bound building blocks (hyper-connection width/depth,
flash attention fwd/bwd, feedforward, depthwise conv, norms) at flagship
shapes — the cost model that directs fusion work. Run alone on the chip
(host contention pollutes timings): `python scripts/perf_breakdown.py`.

Optionally writes a profiler trace with `--trace DIR` and prints the top
self-time ops via xprof's hlo_stats converter.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

from flax import nnx  # noqa: E402

DIM, DEPTH, HEADS, DIM_HEAD = 512, 8, 8, 64
B, N = 16, 1024
M = B * N


def timeit(fn, *args, iters=10, groups=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def bench_train_and_split():
    import functools
    import optax
    from e2_tts_tpu.models.e2tts import E2TTS
    from e2_tts_tpu.training.adopt import adopt

    model = E2TTS(transformer=dict(dim=DIM, depth=DEPTH, heads=HEADS,
                                   dim_head=DIM_HEAD, dropout=0.1,
                                   attn_backend='auto'),
                  rngs=nnx.Rngs(0), dtype=jnp.bfloat16)
    model.train()
    optimizer = nnx.Optimizer(model, optax.chain(
        optax.clip_by_global_norm(1.0), adopt(7.5e-5)), wrt=nnx.Param)

    mel = jax.random.normal(jax.random.key(0), (B, N, 100), dtype=jnp.bfloat16)
    lens = jnp.full((B,), N, dtype=jnp.int32)
    text = jnp.asarray(np.random.default_rng(0).integers(32, 120, (B, 64)),
                       dtype=jnp.int32)

    @functools.partial(nnx.jit, static_argnames=('drop_text',))
    def step(model, optimizer, key, drop_text: bool):
        def loss_fn(m):
            return m(mel, text=text, lens=lens, key=key,
                     drop_text_cond=drop_text).loss
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        optimizer.update(model, grads)
        return loss

    @nnx.jit
    def fwd_only(model, key):
        return model(mel, text=text, lens=lens, key=key,
                     drop_text_cond=False).loss

    @nnx.jit
    def fwd_bwd(model, key):
        def loss_fn(m):
            return m(mel, text=text, lens=lens, key=key,
                     drop_text_cond=False).loss
        loss, grads = nnx.value_and_grad(loss_fn)(model)
        # consume grads or XLA DCEs the whole backward
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree.leaves(grads))
        return loss + gsum * 0.0

    k = jax.random.key(1)
    print(f'train step (w/ text): {timeit(lambda: step(model, optimizer, k, False), iters=5):8.2f} ms')
    print(f'train step (dropped): {timeit(lambda: step(model, optimizer, k, True), iters=5):8.2f} ms')
    print(f'fwd only:             {timeit(lambda: fwd_only(model, k), iters=5):8.2f} ms')
    print(f'fwd+bwd:              {timeit(lambda: fwd_bwd(model, k), iters=5):8.2f} ms')
    return model, step, optimizer, k


def bench_components():
    from e2_tts_tpu.ops import hyper_conn_kernel as hck
    from e2_tts_tpu.ops.flash_attention import flash_attention
    from e2_tts_tpu.models.blocks import FeedForward, DepthwiseConv, RMSNorm, AdaptiveRMSNorm

    dt = jnp.bfloat16
    s = 4

    # -- hyper-connection width (pallas fwd / vjp-replay bwd) --
    r = jax.random.normal(jax.random.key(0), (s, M, DIM), dtype=dt)
    sa = jnp.concatenate([jnp.zeros((s, 1)), jnp.eye(s)], axis=1)
    sb = jnp.ones((s,))
    aw = jnp.zeros((DIM, s + 1))
    bw = jnp.zeros((DIM,))
    args = (r, sa, sb, aw, jnp.asarray(1e-2), bw, jnp.asarray(1e-2))

    wfwd = jax.jit(lambda *a: hck.width_connection(*a))
    print(f'HC width fwd (pallas) @ (4,{M},{DIM}):    {timeit(wfwd, *args):8.3f} ms')

    wref = jax.jit(lambda *a: hck._width_reference(*a))
    print(f'HC width fwd (xla ref):                  {timeit(wref, *args):8.3f} ms')

    def wgrad(*a):
        def f(*a):
            b, c, beta = hck.width_connection(*a)
            return ((b.astype(jnp.float32) ** 2).sum()
                    + (c.astype(jnp.float32) ** 2).sum()
                    + (beta.astype(jnp.float32) ** 2).sum())
        g = jax.grad(f, argnums=tuple(range(7)))(*a)
        return g
    print(f'HC width fwd+bwd (custom vjp):           {timeit(jax.jit(wgrad), *args):8.3f} ms')

    # -- depth connection (carried + branch*beta) --
    carried = jax.random.normal(jax.random.key(1), (s, M, DIM), dtype=dt)
    branch = jax.random.normal(jax.random.key(2), (M, DIM), dtype=dt)
    beta = jnp.ones((s, M), dtype=dt)
    depth = jax.jit(lambda c, b, be: c + b[None] * be[..., None])
    print(f'HC depth connection:                     {timeit(depth, carried, branch, beta):8.3f} ms')

    # -- flash attention --
    q = jax.random.normal(jax.random.key(3), (B, HEADS, N, DIM_HEAD), dtype=dt)
    fa = jax.jit(lambda q: flash_attention(q, q, q, None, softclamp_value=50.0))
    print(f'flash attn fwd @ (16,8,{N},64):           {timeit(fa, q):8.3f} ms')
    fa_d = jax.jit(lambda q: flash_attention(q, q, q, None, softclamp_value=50.0,
                                             dropout_rate=0.1, dropout_seed=7))
    print(f'flash attn fwd dropout=0.1:              {timeit(fa_d, q):8.3f} ms')

    def attn_grad(q, rate):
        def f(q):
            o = flash_attention(q, q, q, None, softclamp_value=50.0,
                                dropout_rate=rate, dropout_seed=7)
            return (o.astype(jnp.float32) ** 2).sum()
        return jax.grad(f)(q)
    print(f'flash attn fwd+bwd:                      {timeit(jax.jit(lambda q: attn_grad(q, 0.0)), q):8.3f} ms')
    print(f'flash attn fwd+bwd dropout=0.1:          {timeit(jax.jit(lambda q: attn_grad(q, 0.1)), q):8.3f} ms')

    # -- feedforward / conv / norms --
    rngs = nnx.Rngs(0)
    x = jax.random.normal(jax.random.key(4), (B, N, DIM), dtype=dt)
    ff = FeedForward(DIM, mult=4.0, dtype=dt, rngs=rngs)
    ff.eval()
    fff = nnx.jit(lambda m, x: m(x))
    print(f'FeedForward fwd:                         {timeit(fff, ff, x):8.3f} ms')

    conv = DepthwiseConv(DIM, kernel_size=31, dtype=dt, rngs=rngs)
    cf = nnx.jit(lambda m, x: m(x))
    print(f'DepthwiseConv k=31 fwd:                  {timeit(cf, conv, x):8.3f} ms')

    rn = RMSNorm(DIM)
    print(f'RMSNorm fwd:                             {timeit(nnx.jit(lambda m, x: m(x)), rn, x):8.3f} ms')

    arn = AdaptiveRMSNorm(DIM, rngs=rngs)
    cond = jax.random.normal(jax.random.key(5), (B, DIM), dtype=dt)
    print(f'AdaptiveRMSNorm fwd:                     {timeit(nnx.jit(lambda m, x, c: m(x, condition=c)), arn, x, cond):8.3f} ms')


def run_trace(trace_dir, model, step, optimizer, k):
    with jax.profiler.trace(trace_dir):
        for i in range(3):
            loss = step(model, optimizer, jax.random.key(i), False)
        loss.block_until_ready()
    print(f'trace written to {trace_dir}')
    try:
        import glob
        import gzip
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        xs = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)
        data, _ = raw_to_tool_data.xspace_to_tool_data(xs, 'hlo_stats', {})
        if isinstance(data, bytes):
            data = gzip.decompress(data).decode()
        print(data[:4000])
    except Exception as e:  # pragma: no cover
        print('xprof conversion failed:', e)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--trace', default=None)
    p.add_argument('--components-only', action='store_true')
    args = p.parse_args()

    if args.components_only:
        bench_components()
        sys.exit(0)

    model, step, optimizer, k = bench_train_and_split()
    bench_components()
    if args.trace:
        run_trace(args.trace, model, step, optimizer, k)
