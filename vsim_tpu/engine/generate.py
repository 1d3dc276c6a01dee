"""Inference engine: jitted prefill + token-at-a-time decode.

TPU-native counterpart of the reference decode loop (main_gptneox,
vsim.cpp:802-897): batch prompt ingest (n_batch prefill), per-token eval,
sampling, EOS stop, streaming token callbacks, and the --return_logits greedy
parity mode (vsim.cpp:827-837, 1000-1010).

Differences by design:
  * prefill and decode are two jitted programs; the KV cache is donated so
    XLA updates it in place instead of reallocating per step.
  * sampling runs on-device (engine/sampling.py), so decode never ships the
    full-vocab logits to the host (the reference partial-sorts 50K logits on
    the host every token, utils.cpp:329 — a ranked hot loop in SURVEY.md §3.4).
  * prompt lengths are bucketed to powers of two to bound recompilation.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vsim_tpu.engine.sampling import SamplingParams, sample_jax
from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.transformer import forward, init_cache
from vsim_tpu import monitor


@dataclasses.dataclass
class GenerationResult:
    token_ids: List[int]  # generated tokens (prompt excluded)
    prompt_ids: List[int]
    logits: Optional[np.ndarray] = None  # [len(prompt), V] when return_logits
    timings: Optional[dict] = None


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class InferenceEngine:
    """Single-model inference engine over one jax device/mesh.

    .. warning:: On TPU the constructor **consumes the caller's params** by
       default: the load-time repacks (qkv fusion, layer unstacking,
       plane-split) free each source buffer as it is transformed, emptying
       ``params["layers"]`` in place — required so 20B models fit a 16 GB
       chip (both layouts alive OOM).  Pass ``consume_params=False`` to keep
       the caller's pytree intact (costs peak HBM ≈ 2x weights).
    """

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        *,
        n_ctx: Optional[int] = None,
        kv_dtype=None,
        donate_cache: bool = True,
        consume_params: bool = True,
        # 64-token on-device chunks: each chunk boundary costs ~30 ms of
        # host/tunnel time even when pipelined, so bigger chunks keep the
        # device busy (GPT-J B=1 e2e/step ratio: 0.71 at 16, 0.84 at 32,
        # 0.89 at 64 — r4); the cost is up to chunk-1 discarded speculative
        # tokens' COMPUTE after a stop token (they are never emitted)
        decode_chunk: int = 64,
        unroll_layers: Optional[bool] = None,
        plane_split: Optional[bool] = None,
    ):
        self.cfg = cfg
        self.params = params
        params = None  # the arg alias would pin pre-transform weights in
        # HBM through the load-time repacks below (gpt-neox-20b OOM)
        self.n_ctx = n_ctx or cfg.n_ctx
        self.kv_dtype = jnp.dtype(kv_dtype or cfg.kv_dtype)
        self.decode_chunk = decode_chunk

        # pad a misaligned quantized lm_head (e.g. vocab 50400) to a lane
        # multiple so the Pallas decode kernel serves it; forward() slices
        # the logits back to n_vocab
        from vsim_tpu.quant.q4 import Q4Tensor as _Q4

        # 1024-multiple: gives every vocab a lane-aligned WIDE tile divisor
        # (e.g. 50400/50432 → 51200 = 10x5120) so the gi decode kernel's
        # wide-burst geometry applies to the lm head too; pad rows dequantize
        # to 0 and forward() slices logits back to n_vocab
        lm = self.params.get("lm_head")
        if isinstance(lm, _Q4) and lm.out_features % 1024:
            self.params = dict(self.params, lm_head=lm.pad_out(1024))

        if cfg.fuse_qkv:
            from vsim_tpu.models.init import fuse_qkv_params

            self.params = fuse_qkv_params(cfg, self.params,
                                          consume=consume_params)

        # Unroll the layer loop: per-layer Q4 buffers → flat Pallas kernels
        # with static layer indices (the stacked scalar-prefetch kernel costs
        # 1.8-3.8x per tile, BASELINE.md r2).  Auto: on TPU whenever the
        # model carries stacked Q4 weights.  Callers should drop their own
        # reference to the stacked params after constructing the engine so
        # the stacked buffers actually free (models/init.py:
        # unstack_layer_params memory note).
        if unroll_layers is None:
            unroll_layers = jax.default_backend() == "tpu" and any(
                (isinstance(v, _Q4) and v.packed.ndim == 3)
                or (isinstance(v, tuple) and v and isinstance(v[0], _Q4))
                for v in self.params["layers"].values()
            )
        # Unstack (consume=True frees each stacked group as it is copied —
        # pythia-12b OOMed a 16 GB chip with both layouts alive) and
        # plane-split repack: the two nibble planes become contiguous halves
        # of x, so each decode matmul runs the glue-free kernel — no
        # pad-concat, no strided deinterleave, no output slice (~50 us of
        # host graph per call, the measured B=1 wall; _kernel_ps).
        if plane_split is None:
            plane_split = bool(unroll_layers)
        if unroll_layers:
            from vsim_tpu.models.init import prepare_unrolled_params

            self.params = prepare_unrolled_params(
                self.params, consume=consume_params, plane_split=plane_split)
        self.unrolled = unroll_layers
        self.plane_split = plane_split and unroll_layers

        donate = (2,) if donate_cache else ()

        @partial(jax.jit, donate_argnums=donate, static_argnames=("kv_len",))
        def _prefill(params, token_ids, cache, n_past, kv_len=None):
            # fresh_kv: the engine always prefills the whole prompt from an
            # empty cache (n_past=0), so attention can use this chunk's own
            # full-precision k/v — no quantized-cache read-back (see
            # models/transformer.py:attention)
            logits, cache = forward(cfg, params, token_ids, cache, n_past,
                                    kv_len=kv_len, fresh_kv=True)
            return logits, cache

        def _one_step(params, token, cache, n_past, last_tokens, key, sk,
                      kv_len=None):
            logits, cache = forward(cfg, params, token[:, None], cache, n_past,
                                    kv_len=kv_len)
            logits = logits[:, -1, :]
            key, sub = jax.random.split(key)
            next_tok = sample_jax(
                logits, last_tokens, sub,
                top_k=sk["top_k"], top_p=sk["top_p"],
                temperature=sk["temperature"],
                repeat_penalty=sk["repeat_penalty"], greedy=sk["greedy"],
            )
            # shift the repeat window
            last_tokens = jnp.concatenate(
                [last_tokens[:, 1:], next_tok[:, None]], axis=1
            )
            return next_tok, cache, last_tokens, key

        @partial(jax.jit, donate_argnums=donate,
                 static_argnames=_STEP_STATIC + ("kv_len",))
        def _decode_step(
            params, token, cache, n_past, last_tokens, key,
            *, top_k, top_p, temperature, repeat_penalty, greedy, kv_len=None,
        ):
            sk = dict(top_k=top_k, top_p=top_p, temperature=temperature,
                      repeat_penalty=repeat_penalty, greedy=greedy)
            return _one_step(params, token, cache, n_past, last_tokens, key,
                             sk, kv_len)

        @partial(
            jax.jit,
            donate_argnums=donate,
            static_argnames=_STEP_STATIC + ("n_steps", "kv_len"),
        )
        def _decode_many(
            params, token, cache, n_past, last_tokens, key,
            *, n_steps, top_k, top_p, temperature, repeat_penalty, greedy,
            kv_len=None,
        ):
            """n_steps decode iterations fully on-device (lax.scan): one
            dispatch, one host fetch per chunk instead of per token."""
            sk = dict(top_k=top_k, top_p=top_p, temperature=temperature,
                      repeat_penalty=repeat_penalty, greedy=greedy)

            def body(carry, _):
                token, cache, n_past, last_tokens, key = carry
                token, cache, last_tokens, key = _one_step(
                    params, token, cache, n_past, last_tokens, key, sk, kv_len
                )
                return (token, cache, n_past + 1, last_tokens, key), token

            n_past = jnp.asarray(n_past, jnp.int32)
            (token, cache, _, last_tokens, key), toks = jax.lax.scan(
                body, (token, cache, n_past, last_tokens, key), None,
                length=n_steps,
            )
            return toks, cache, last_tokens, key  # toks: [n_steps, B]

        self._prefill = _prefill
        self._decode_step = _decode_step
        self._decode_many = _decode_many

    def new_cache(self, batch: int = 1):
        return init_cache(self.cfg, batch, n_ctx=self.n_ctx, dtype=self.kv_dtype)

    def kv_bucket(self, needed: int) -> int:
        """Static attended-cache length covering ``needed`` slots: POWERS OF
        TWO from 128, so short sequences don't stream the whole n_ctx cache
        and the bucket count stays ~log2(n_ctx/128).  (128-multiples
        compiled a fresh executable per 128 tokens of growth — each a
        minutes-long remote compile through the axon tunnel; a 192-token
        generation measured 13 tok/s e2e from exactly that.)  The cost is
        attending up to 2x the needed slots, bounded by the KV read being a
        small share of the decode step."""
        b = 128
        while b < needed and b < self.n_ctx:
            b *= 2
        return min(self.n_ctx, b)

    # -- generation --------------------------------------------------------

    def generate(
        self,
        prompt_ids: Sequence[int],
        n_predict: int = 100,
        sampling: Optional[SamplingParams] = None,
        *,
        stop_tokens: Sequence[int] = (),
        streaming_token_hook: Optional[Callable[[int], None]] = None,
        return_logits: bool = False,
    ) -> GenerationResult:
        """Generate tokens for one prompt (batch=1 path, reference CLI parity).

        ``return_logits`` replicates --return_logits: greedy, returns the
        full-vocab logits for every prompt position (vsim.cpp:827-873).
        """
        sp = sampling or SamplingParams()
        prompt_ids = [int(t) for t in prompt_ids]
        n_prompt = len(prompt_ids)
        assert n_prompt >= 1, "empty prompt"
        assert n_prompt + n_predict <= self.n_ctx, (
            f"prompt({n_prompt}) + n_predict({n_predict}) exceeds n_ctx={self.n_ctx}"
        )

        t0 = time.perf_counter()
        # ---- prefill (padded to bucket; pad slots masked by causality and
        # overwritten by subsequent decode steps)
        T = min(_bucket(n_prompt), self.n_ctx)
        padded = prompt_ids + [0] * (T - n_prompt)
        token_ids = jnp.asarray([padded], jnp.int32)
        cache = self.new_cache(batch=1)
        with monitor.span("prefill"):
            logits, cache = self._prefill(self.params, token_ids, cache, 0,
                                          kv_len=T)
            logits.block_until_ready()
        t_prefill = time.perf_counter()

        if return_logits:
            out = np.asarray(logits[0, :n_prompt, :], dtype=np.float32)
            return GenerationResult(
                token_ids=[], prompt_ids=prompt_ids, logits=out,
                timings={"prefill_s": t_prefill - t0},
            )

        # ---- sampling state
        seed = sp.seed if sp.seed >= 0 else int(time.time())
        key = jax.random.PRNGKey(seed)
        W = max(sp.repeat_last_n, 1)
        window = np.full((1, W), -1, np.int32)
        for t in prompt_ids[-W:]:
            window = np.concatenate([window[:, 1:], [[t]]], axis=1)
        last_tokens = jnp.asarray(window)

        # first generated token comes from the prefill logits
        key, sub = jax.random.split(key)
        tok = sample_jax(
            logits[:, n_prompt - 1, :], last_tokens, sub,
            top_k=sp.top_k, top_p=sp.top_p, temperature=sp.temperature,
            repeat_penalty=sp.repeat_penalty, greedy=sp.greedy,
        )
        last_tokens = jnp.concatenate([last_tokens[:, 1:], tok[:, None]], axis=1)

        generated: List[int] = []
        n_past = n_prompt
        sample_kwargs = dict(
            top_k=sp.top_k, top_p=sp.top_p, temperature=sp.temperature,
            repeat_penalty=sp.repeat_penalty, greedy=sp.greedy,
        )
        stop = set(int(t) for t in stop_tokens)

        def emit(tok_host: int) -> bool:
            """Record one token; True → stop generation."""
            generated.append(tok_host)
            if streaming_token_hook is not None:
                streaming_token_hook(tok_host)
            return tok_host in stop

        stopped = False

        def drain(toks_dev) -> bool:
            """Fetch one chunk's tokens to the host and emit them.
            True → generation is over (stop token or budget)."""
            for t in np.asarray(toks_dev[:, 0]):
                if emit(int(t)) or len(generated) >= n_predict:
                    return True
            return False

        with monitor.span("decode"):
            # Tokens decode in on-device chunks.  Sampling runs on device,
            # so chunk k+1 needs NOTHING from the host: it is dispatched
            # BEFORE chunk k's tokens are fetched, hiding the device→host
            # round trip (~30 ms through the axon tunnel — the round-2
            # e2e-vs-step gap) behind compute.  A stop token discovered in
            # chunk k just discards later chunks' speculatively-computed
            # tokens.  The FIRST generated token (from the prefill logits)
            # is emitted only after the first chunks are enqueued — its
            # value fetch costs an RTT that would otherwise idle the device.
            tok_first = tok
            emitted_first = False
            n_dispatched = 1
            pending: List = []  # device tokens of in-flight chunks
            while True:
                # keep THREE chunks in flight: one dispatch costs ~30 ms of
                # host/tunnel time, so with a single pending chunk the
                # device idles that long between chunks (measured e2e/step
                # 0.83 at depth 1); depth 3 keeps the device fed across a
                # drain+dispatch boundary (fetch RTT + enqueue RTT)
                while (not stopped and n_dispatched < n_predict
                       and (self.n_ctx - 1 - n_past) > 0 and len(pending) < 3):
                    # chunk size: smallest power of two >= the remaining
                    # budget, capped at decode_chunk — a 20-token request
                    # must not compute a full 96-step chunk, while the size
                    # set stays small ({16, 32, 64, ..., decode_chunk}) so
                    # each size compiles exactly once
                    c = 16
                    while (c < n_predict - n_dispatched
                           and c < self.decode_chunk):
                        c *= 2
                    n_steps = min(c, self.decode_chunk,
                                  self.n_ctx - 1 - n_past)
                    toks, cache, last_tokens, key = self._decode_many(
                        self.params, tok, cache, n_past, last_tokens, key,
                        n_steps=n_steps,
                        kv_len=self.kv_bucket(n_past + n_steps),
                        **sample_kwargs,
                    )
                    n_past += n_steps
                    tok = toks[-1]
                    n_dispatched += n_steps
                    pending.append(toks)
                if not emitted_first:
                    emitted_first = True
                    stopped = emit(int(tok_first[0])) or stopped
                    if len(generated) >= n_predict:
                        stopped = True
                    continue  # let the dispatch loop see a first-token stop
                if not pending:
                    break
                chunk = pending.pop(0)
                if not stopped:
                    # once a stop token has been emitted, in-flight chunks
                    # are speculative work: discard them WITHOUT emitting
                    # (draining them appended up to chunk-1 post-stop tokens)
                    stopped = drain(chunk)
        t_done = time.perf_counter()

        n_gen = len(generated)
        timings = {
            "prefill_s": t_prefill - t0,
            "decode_s": t_done - t_prefill,
            "tokens": n_gen,
            "tokens_per_s": (n_gen - 1) / (t_done - t_prefill)
            if n_gen > 1 and t_done > t_prefill
            else float("nan"),
        }
        return GenerationResult(
            token_ids=generated, prompt_ids=prompt_ids, timings=timings
        )


_STEP_STATIC = ("top_k", "top_p", "temperature", "repeat_penalty", "greedy")
