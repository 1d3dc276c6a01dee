"""Continuous-batching serving engine.

The reference is strictly one-prompt-one-process (main_gptneox decode loop,
vsim.cpp:802-897).  Production TPU serving wants many concurrent sequences
sharing one weights-resident model: each decode step is a single batched
forward where every sequence sits at its own cache offset (ragged ``n_past``
vector — models/transformer.py), so one HBM sweep of the Q4 weights serves
``max_batch`` tokens.

Scheme (vLLM-style slots without paging — the cache is a dense head-major
[L, max_batch, H, n_ctx, D] block):
  * ``submit()`` queues a request; a free slot is claimed and the prompt is
    prefilled into that slot's cache rows (B=1 slice in/out, so prefill cost
    does not scale with max_batch).
  * ``step()`` advances every active slot by one token in one jitted ragged
    forward + on-device sampling, then retires EOS/finished slots.
  * ``run()`` drives submit/step to completion for a list of prompts.

Per-slot sampling state (repeat-penalty window, utils.cpp:339-422 semantics)
rides in device arrays indexed by slot.
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vsim_tpu.engine.sampling import SamplingParams, sample_jax
from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.transformer import forward, init_cache

_STEP_STATIC = ("top_k", "top_p", "temperature", "repeat_penalty", "greedy")


@dataclasses.dataclass
class Request:
    request_id: int
    prompt_ids: List[int]
    n_predict: int
    stop_tokens: frozenset
    streaming_token_hook: Optional[Callable[[int], None]] = None
    # filled during serving
    slot: int = -1
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    submitted_s: float = 0.0
    first_token_s: float = 0.0
    finished_s: float = 0.0


class ServingEngine:
    def __init__(
        self,
        cfg: ModelConfig,
        params,
        *,
        max_batch: int = 8,
        n_ctx: Optional[int] = None,
        sampling: Optional[SamplingParams] = None,
        seed: int = 0,
        repeat_window: int = 64,
    ):
        self.cfg = cfg
        from vsim_tpu.quant.q4 import Q4Tensor as _Q4

        lm = params.get("lm_head")
        if isinstance(lm, _Q4) and lm.out_features % 256:
            params = dict(params, lm_head=lm.pad_out(256))
        if cfg.fuse_qkv:
            from vsim_tpu.models.init import fuse_qkv_params

            params = fuse_qkv_params(cfg, params)
        self.params = params
        self.max_batch = max_batch
        self.n_ctx = n_ctx or cfg.n_ctx
        self.sampling = sampling or SamplingParams(greedy=True)
        W = max(repeat_window, 1)
        self.repeat_window = W

        self.cache = init_cache(cfg, max_batch, n_ctx=self.n_ctx)
        # device-resident per-slot state
        self.tokens = jnp.zeros((max_batch,), jnp.int32)  # next input token
        self.n_past = jnp.zeros((max_batch,), jnp.int32)
        self.last_tokens = jnp.full((max_batch, W), -1, jnp.int32)
        self.key = jax.random.PRNGKey(seed)

        # host-side bookkeeping
        self._free: List[int] = list(range(max_batch))
        self._active: Dict[int, Request] = {}  # slot -> request
        self._queue: List[Request] = []
        self._results: Dict[int, Request] = {}
        self._ids = itertools.count()

        L = cfg.n_layer

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("kv_len",))
        def _prefill_slot(params, cache, ids_1t, slot, window, kv_len=None):
            """Prefill one slot: slice its cache rows out, run B=1, splice
            back.  Returns (cache, first_logits [V], last_tokens row).
            tree-mapped so int8 caches ((values, scales) pairs — batch is
            axis 1 in both) work unchanged."""
            zero = jnp.int32(0)
            sub_in = jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1),
                cache)
            logits, sub = forward(cfg, params, ids_1t, sub_in, zero,
                                  kv_len=kv_len, fresh_kv=True)
            new_cache = jax.tree.map(
                lambda full, s: jax.lax.dynamic_update_slice_in_dim(
                    full, s, slot, axis=1),
                cache, sub)
            return new_cache, logits[0], window

        @partial(jax.jit, donate_argnums=(1,),
                 static_argnames=_STEP_STATIC + ("kv_len",))
        def _step(params, cache, tokens, n_past, last_tokens, key, active,
                  *, top_k, top_p, temperature, repeat_penalty, greedy,
                  kv_len=None):
            logits, cache = forward(
                cfg, params, tokens[:, None], cache, n_past, kv_len=kv_len)
            logits = logits[:, -1, :]
            key, sub = jax.random.split(key)
            nxt = sample_jax(
                logits, last_tokens, sub, top_k=top_k, top_p=top_p,
                temperature=temperature, repeat_penalty=repeat_penalty,
                greedy=greedy)
            nxt = jnp.where(active, nxt, tokens)
            last_tokens = jnp.where(
                active[:, None],
                jnp.concatenate([last_tokens[:, 1:], nxt[:, None]], axis=1),
                last_tokens)
            n_past = jnp.where(active, n_past + 1, n_past)
            return cache, nxt, n_past, last_tokens, key

        self._prefill_slot = _prefill_slot
        self._step_fn = _step

    # ------------------------------------------------------------------

    def submit(
        self,
        prompt_ids: Sequence[int],
        n_predict: int = 100,
        *,
        stop_tokens: Sequence[int] = (2,),  # reference EOS, vsim.cpp:894
        streaming_token_hook: Optional[Callable[[int], None]] = None,
    ) -> int:
        ids = [int(t) for t in prompt_ids]
        assert ids, "empty prompt"
        assert len(ids) + n_predict <= self.n_ctx, "prompt+n_predict > n_ctx"
        req = Request(
            request_id=next(self._ids), prompt_ids=ids, n_predict=n_predict,
            stop_tokens=frozenset(int(t) for t in stop_tokens),
            streaming_token_hook=streaming_token_hook,
            submitted_s=time.perf_counter(),
        )
        self._queue.append(req)
        return req.request_id

    def _admit(self) -> None:
        """Claim free slots for queued requests and prefill them."""
        while self._queue and self._free:
            req = self._queue.pop(0)
            slot = self._free.pop(0)
            req.slot = slot
            n_prompt = len(req.prompt_ids)
            T = 16
            while T < n_prompt:
                T *= 2
            T = min(T, self.n_ctx)
            padded = req.prompt_ids + [0] * (T - n_prompt)
            ids = jnp.asarray([padded], jnp.int32)
            window = np.full((self.repeat_window,), -1, np.int32)
            for t in req.prompt_ids[-self.repeat_window:]:
                window = np.concatenate([window[1:], [t]])
            self.cache, logits, wrow = self._prefill_slot(
                self.params, self.cache, ids, jnp.int32(slot),
                jnp.asarray(window), kv_len=T)
            # first generated token from the prefill logits
            sp = self.sampling
            self.key, sub = jax.random.split(self.key)
            tok = sample_jax(
                logits[None, n_prompt - 1, :], wrow[None], sub,
                top_k=sp.top_k, top_p=sp.top_p, temperature=sp.temperature,
                repeat_penalty=sp.repeat_penalty, greedy=sp.greedy)[0]
            wrow = jnp.concatenate([wrow[1:], tok[None]])
            self.tokens = self.tokens.at[slot].set(tok)
            self.n_past = self.n_past.at[slot].set(n_prompt)
            self.last_tokens = self.last_tokens.at[slot].set(wrow)
            self._active[slot] = req
            req.first_token_s = time.perf_counter()
            self._emit(req, int(tok))

    def _emit(self, req: Request, tok: int) -> None:
        req.generated.append(tok)
        if req.streaming_token_hook is not None:
            req.streaming_token_hook(tok)
        if tok in req.stop_tokens or len(req.generated) >= req.n_predict:
            self._finish(req)

    def _finish(self, req: Request) -> None:
        req.done = True
        req.finished_s = time.perf_counter()
        self._results[req.request_id] = req
        if req.slot >= 0:
            del self._active[req.slot]
            self._free.append(req.slot)
            req.slot = -1

    def step(self) -> List[int]:
        """Admit queued requests, advance all active slots one token.
        Returns request_ids that finished this step."""
        self._admit()
        if not self._active:
            return []
        active_mask = np.zeros((self.max_batch,), bool)
        longest = 1
        for slot, req in self._active.items():
            active_mask[slot] = True
            longest = max(longest, len(req.prompt_ids) + len(req.generated))
        kv_len = min(self.n_ctx, max(128, -(-(longest + 1) // 128) * 128))
        sp = self.sampling
        self.cache, nxt, self.n_past, self.last_tokens, self.key = (
            self._step_fn(
                self.params, self.cache, self.tokens, self.n_past,
                self.last_tokens, self.key, jnp.asarray(active_mask),
                top_k=sp.top_k, top_p=sp.top_p, temperature=sp.temperature,
                repeat_penalty=sp.repeat_penalty, greedy=sp.greedy,
                kv_len=kv_len))
        self.tokens = nxt
        toks = np.asarray(nxt)
        finished = []
        for slot, req in list(self._active.items()):
            self._emit(req, int(toks[slot]))
            if req.done:
                finished.append(req.request_id)
        return finished

    def run(
        self,
        prompts: Sequence[Sequence[int]],
        n_predict: int = 100,
        *,
        stop_tokens: Sequence[int] = (2,),
    ) -> Dict[int, Request]:
        """Serve a batch of prompts to completion; returns requests by id."""
        for p in prompts:
            self.submit(p, n_predict, stop_tokens=stop_tokens)
        while self._queue or self._active:
            self.step()
        out, self._results = self._results, {}
        return out
