"""Speculative decoding — draft/verify acceleration of the decode loop.

The reference decodes strictly one token per full-model forward
(main_gptneox, vsim.cpp:802-897).  Decode on TPU is HBM-bound on the Q4
weight bytes (ops/pallas_q4.py), so a forward over T=gamma+1 tokens costs
nearly the same HBM time as T=1 — speculative decoding turns that slack
into accepted tokens: a cheap *drafter* proposes ``gamma`` tokens, the
target model scores all of them in ONE forward, and the longest
target-agreeing prefix is accepted (greedy verification, Leviathan et al.
2023 with greedy acceptance).  Greedy output is **bit-identical** to plain
greedy decoding — only faster — so the reference parity guarantees
(--return_logits / golden streams, vsim.cpp:827-837) are preserved.

Two drafters:
  * ``ModelDrafter``     — a small same-tokenizer model (e.g. pythia-70m
    drafting for pythia-12b) run autoregressively for gamma steps.
  * ``NgramDrafter``     — prompt-lookup decoding: match the last ``m``
    generated tokens against the sequence history and propose the tokens
    that followed the previous occurrence.  Zero extra weights; wins on
    code/extractive prompts.

The whole draft→verify→accept cycle runs on-device inside ``lax.scan``
(one host fetch per chunk of cycles, like engine/generate.py's chunked
decode), with per-sequence ragged acceptance: each batch row advances by
its own ``a+1`` tokens per cycle via the ragged ``n_past`` path of
models/transformer.py:forward.

KV-cache discipline on partial acceptance: positions past the accepted
prefix hold stale entries, but attention masks strictly by position
(``s <= n_past + t``) and later cycles overwrite them, so no rewind copy is
ever needed — rejected work costs nothing but the bytes already streamed.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vsim_tpu import monitor
from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.transformer import forward, init_cache


@dataclasses.dataclass
class SpecResult:
    token_ids: List[int]
    prompt_ids: List[int]
    timings: Optional[dict] = None
    # acceptance telemetry: generated tokens per target forward
    cycles: int = 0
    tokens_per_cycle: float = 0.0


# ---------------------------------------------------------------------------
# drafters
# ---------------------------------------------------------------------------


class ModelDrafter:
    """Draft with a small same-tokenizer model, greedy, gamma steps.

    State = (draft KV cache).  The drafter tracks the *same* n_past as the
    target: on partial acceptance its stale cache tail is masked/overwritten
    exactly like the target's."""

    def __init__(self, cfg: ModelConfig, params, gamma: int = 4):
        self.cfg = cfg
        self.params = params
        self.gamma = gamma

    def init_state(self, batch: int, n_ctx: int):
        return init_cache(self.cfg, batch, n_ctx=n_ctx)

    def prefill(self, state, token_ids, n_past, kv_len):
        """Ingest prompt tokens into the draft cache."""
        _, cache = forward(self.cfg, self.params, token_ids, state, n_past,
                           kv_len=kv_len)
        return cache

    def propose(self, params, state, cur, history, n_past, kv_len):
        """gamma greedy draft tokens from ``cur`` [B]. Returns (d [B, gamma],
        new_state).  ``params`` arrives as a jit argument (not closed over)
        so the engine's chunk executable doesn't bake the draft weights in
        as constants."""
        del history

        def body(carry, _):
            tok, cache, np_ = carry
            logits, cache = forward(self.cfg, params, tok[:, None],
                                    cache, np_, kv_len=kv_len)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return (nxt, cache, np_ + 1), nxt

        (_, cache, _), drafts = jax.lax.scan(
            body, (cur, state, n_past), None, length=self.gamma)
        return jnp.swapaxes(drafts, 0, 1), cache  # [B, gamma]


class NgramDrafter:
    """Prompt-lookup decoding: propose the continuation of the most recent
    previous occurrence of the current ``m``-token suffix in the history.

    No weights, no cache; state is a dummy scalar.  History is the device
    token buffer the engine maintains ([B, n_ctx] int32, -1 padded)."""

    def __init__(self, m: int = 3, gamma: int = 4):
        self.m = m
        self.gamma = gamma

    def init_state(self, batch: int, n_ctx: int):
        return jnp.zeros((), jnp.int32)

    def prefill(self, state, token_ids, n_past, kv_len):
        return state

    def propose(self, params, state, cur, history, n_past, kv_len):
        """history [B, S] holds tokens 0..n_past-1 (rest -1); cur [B] is the
        token at position n_past.  Suffix = last (m-1) history tokens + cur."""
        del params
        B, S = history.shape
        m, gamma = self.m, self.gamma
        # suffix[b, j] = token at position n_past - (m-1) + j, j in [0, m-1]
        pos = jnp.arange(m - 1, dtype=jnp.int32)[None, :] \
            + (n_past[:, None] - (m - 1))
        valid_sfx = pos >= 0
        sfx = jnp.take_along_axis(
            history, jnp.clip(pos, 0, S - 1), axis=1)  # [B, m-1]
        sfx = jnp.where(valid_sfx, sfx, -2)
        full_sfx = jnp.concatenate([sfx, cur[:, None]], axis=1)  # [B, m]

        # candidate start positions p: history[p : p+m] == full_sfx, with the
        # match ending strictly before n_past (p + m - 1 < n_past) — compare
        # all positions at once: an [B, S, m] gather, tiny vs a forward.
        p_idx = jnp.arange(S, dtype=jnp.int32)  # [S]
        win = p_idx[None, :, None] \
            + jnp.arange(m, dtype=jnp.int32)[None, None, :]  # [1, S, m]
        winc = jnp.broadcast_to(jnp.clip(win, 0, S - 1), (B, S, m))
        windows = jnp.take_along_axis(
            history, winc.reshape(B, S * m), axis=1).reshape(B, S, m)
        match = jnp.all(windows == full_sfx[:, None, :], axis=2)  # [B, S]
        in_range = (p_idx[None, :] + m - 1) < n_past[:, None]
        match = match & in_range
        # most recent occurrence
        best = jnp.max(jnp.where(match, p_idx[None, :], -1), axis=1)  # [B]
        found = best >= 0

        # proposal: tokens following the matched window
        prop_pos = best[:, None] + m + jnp.arange(gamma, dtype=jnp.int32)
        prop_hist = jnp.take_along_axis(
            history, jnp.clip(prop_pos, 0, S - 1), axis=1)  # [B, gamma]
        prop_ok = found[:, None] & (prop_pos < n_past[:, None]) \
            & (prop_pos >= 0) & (prop_hist >= 0)
        # fall back to repeating cur (harmless: verification discards misses)
        drafts = jnp.where(prop_ok, prop_hist, cur[:, None])
        return drafts, state


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


class SpeculativeEngine:
    """Greedy speculative decoding over one target model + one drafter.

    Produces exactly the plain-greedy token stream of InferenceEngine, in
    fewer target forwards.  ``drafter`` is a ModelDrafter or NgramDrafter.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        drafter,
        *,
        n_ctx: Optional[int] = None,
        cycles_per_chunk: int = 8,
    ):
        self.cfg = cfg
        self.n_ctx = n_ctx or cfg.n_ctx
        self.drafter = drafter
        self.gamma = drafter.gamma
        self.cycles_per_chunk = cycles_per_chunk

        from vsim_tpu.quant.q4 import Q4Tensor as _Q4

        from vsim_tpu.models.init import fuse_qkv_params

        lm = params.get("lm_head")
        if isinstance(lm, _Q4) and lm.out_features % 256:
            params = dict(params, lm_head=lm.pad_out(256))
        if cfg.fuse_qkv:
            params = fuse_qkv_params(cfg, params)
        self.params = params
        dp = getattr(drafter, "params", None)
        if dp is not None:
            dlm = dp.get("lm_head")
            if isinstance(dlm, _Q4) and dlm.out_features % 256:
                dp = dict(dp, lm_head=dlm.pad_out(256))
            if getattr(drafter, "cfg", cfg).fuse_qkv:
                dp = fuse_qkv_params(getattr(drafter, "cfg", cfg), dp)
            drafter.params = dp

        gamma = self.gamma

        @partial(jax.jit, donate_argnums=(2, 3),
                 static_argnames=("n_cycles", "kv_len"))
        def _spec_chunk(params, dparams, tcache, dstate, cur, n_past,
                        history, buf, count, *, n_cycles, kv_len):
            """n_cycles of draft→verify→accept, fully on device.

            carry: cur [B] next input token; n_past [B] finalized positions;
            history [B, n_ctx] token record (drives NgramDrafter + output);
            buf [B, cap] emitted tokens; count [B] emitted so far."""
            B = cur.shape[0]
            b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]

            def cycle(carry, _):
                tcache, dstate, cur, n_past, history, buf, count = carry
                drafts, dstate2 = drafter.propose(
                    dparams, dstate, cur, history, n_past, kv_len)
                # verify: one target forward over [cur, d1..dgamma]
                verify_in = jnp.concatenate([cur[:, None], drafts], axis=1)
                logits, tcache2 = forward(
                    self.cfg, params, verify_in, tcache, n_past,
                    kv_len=kv_len)
                targets = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                # accept while draft matches the target's greedy choice
                match = drafts == targets[:, :gamma]  # [B, gamma]
                a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                            axis=1)  # [B] accepted drafts
                bonus = jnp.take_along_axis(
                    targets, a[:, None], axis=1)[:, 0]  # t_a
                # emitted tokens this cycle: d1..da then bonus at index a
                j = jnp.arange(gamma + 1, dtype=jnp.int32)[None, :]
                emit = jnp.where(
                    j < a[:, None],
                    jnp.pad(drafts, ((0, 0), (0, 1))),
                    bonus[:, None])  # [B, gamma+1] (j > a values unused)
                emit_ok = j <= a[:, None]
                # write into the output buffer and the history
                dst = count[:, None] + j
                dst = jnp.where(emit_ok, dst, buf.shape[1])  # drop beyond a
                buf2 = buf.at[b_idx, dst].set(emit, mode="drop")
                hpos = n_past[:, None] + 1 + j  # history pos of emitted tok
                hpos = jnp.where(emit_ok, hpos, history.shape[1])
                history2 = history.at[b_idx, hpos].set(emit, mode="drop")
                # history[n_past] = cur (finalized this cycle)
                history2 = history2.at[b_idx[:, 0], n_past].set(cur,
                                                                mode="drop")
                n_emit = a + 1
                return (tcache2, dstate2, bonus, n_past + n_emit, history2,
                        buf2, count + n_emit), n_emit

            (tcache, dstate, cur, n_past, history, buf, count), emits = (
                jax.lax.scan(
                    cycle,
                    (tcache, dstate, cur, n_past, history, buf, count),
                    None, length=n_cycles))
            return tcache, dstate, cur, n_past, history, buf, count, emits

        self._spec_chunk = _spec_chunk

        @partial(jax.jit, donate_argnums=(2,), static_argnames=("kv_len",))
        def _prefill_target(params, ids, cache, kv_len):
            return forward(self.cfg, params, ids, cache, jnp.int32(0),
                           kv_len=kv_len, fresh_kv=True)

        self._prefill_target = _prefill_target

        dcfg = getattr(drafter, "cfg", None)
        if dcfg is not None:
            @partial(jax.jit, donate_argnums=(2,), static_argnames=("kv_len",))
            def _prefill_draft(params, ids, cache, kv_len):
                _, c = forward(dcfg, params, ids, cache, jnp.int32(0),
                               kv_len=kv_len, fresh_kv=True)
                return c

            self._prefill_draft = _prefill_draft
        else:
            self._prefill_draft = None

    def kv_bucket(self, needed: int) -> int:
        # power-of-two buckets (see engine/generate.py:kv_bucket)
        b = 128
        while b < needed and b < self.n_ctx:
            b *= 2
        return min(self.n_ctx, b)

    def generate(
        self,
        prompt_ids: Sequence[int],
        n_predict: int = 100,
        *,
        stop_tokens: Sequence[int] = (),
    ) -> SpecResult:
        """Greedy speculative generation, batch=1 (API parity with
        InferenceEngine.generate greedy mode — identical token stream)."""
        prompt_ids = [int(t) for t in prompt_ids]
        n_prompt = len(prompt_ids)
        assert n_prompt >= 1
        assert n_prompt + n_predict <= self.n_ctx

        B = 1
        gamma = self.gamma
        t0 = time.perf_counter()

        # prefill both models
        T = 16
        while T < n_prompt:
            T *= 2
        T = min(T, self.n_ctx)
        padded = prompt_ids + [0] * (T - n_prompt)
        ids = jnp.asarray([padded], jnp.int32)
        tcache = init_cache(self.cfg, B, n_ctx=self.n_ctx)
        with monitor.span("spec/prefill"):
            logits, tcache = self._prefill_target(self.params, ids, tcache,
                                                  kv_len=T)
            dstate = self.drafter.init_state(B, self.n_ctx)
            if self._prefill_draft is not None:
                dstate = self._prefill_draft(self.drafter.params, ids, dstate,
                                             kv_len=T)
        cur = jnp.argmax(logits[:, n_prompt - 1, :], axis=-1).astype(jnp.int32)
        t_prefill = time.perf_counter()

        history = jnp.full((B, self.n_ctx), -1, jnp.int32)
        history = history.at[0, :n_prompt].set(jnp.asarray(prompt_ids))
        cap = n_predict + gamma + 1
        buf = jnp.full((B, cap), -1, jnp.int32)
        # emitted token #0 is ``cur`` itself (from prefill logits)
        buf = buf.at[0, 0].set(cur[0])
        count = jnp.ones((B,), jnp.int32)
        n_past = jnp.full((B,), n_prompt, jnp.int32)

        stop = set(int(t) for t in stop_tokens)
        cycles = 0
        emit_log: List[int] = []  # per-cycle emitted counts, batch row 0
        while True:
            c = np.asarray(count)
            if int(c.min()) >= n_predict:
                break
            # room check: worst case each chunk adds (gamma+1)*n_cycles
            npmax = int(np.asarray(n_past).max())
            n_cycles = self.cycles_per_chunk
            room = self.n_ctx - 1 - npmax - (gamma + 1)
            if room <= 0:
                break
            n_cycles = min(n_cycles, max(1, room // (gamma + 1)))
            kv_len = self.kv_bucket(npmax + (gamma + 1) * n_cycles + 1)
            dparams = getattr(self.drafter, "params", None)
            if dparams is None:
                dparams = jnp.zeros((), jnp.int32)
            with monitor.span("spec/draft+verify"):
                tcache, dstate, cur, n_past, history, buf, count, emits = (
                    self._spec_chunk(
                        self.params, dparams, tcache, dstate, cur, n_past,
                        history, buf, count, n_cycles=n_cycles,
                        kv_len=kv_len))
            emit_log.extend(int(e) for e in np.asarray(emits[:, 0]))
            # early host stop check on EOS
            if stop:
                got = np.asarray(buf[0, : int(np.asarray(count)[0])])
                if any(int(t) in stop for t in got):
                    break
        t_done = time.perf_counter()

        out = [int(t) for t in np.asarray(buf[0]) if t >= 0][:n_predict]
        if stop:
            trimmed = []
            for t in out:
                trimmed.append(t)
                if t in stop:
                    break
            out = trimmed
        n_gen = len(out)
        # effective cycles: how many verify forwards were *needed* for the
        # returned tokens (the last chunk may have overshot the budget)
        have = 1  # token #0 came from the prefill logits
        cycles = 0
        for e in emit_log:
            if have >= n_gen:
                break
            have += e
            cycles += 1
        timings = {
            "prefill_s": t_prefill - t0,
            "decode_s": t_done - t_prefill,
            "tokens": n_gen,
            "tokens_per_s": (n_gen - 1) / (t_done - t_prefill)
            if n_gen > 1 else float("nan"),
        }
        return SpecResult(
            token_ids=out, prompt_ids=prompt_ids, timings=timings,
            cycles=cycles,
            tokens_per_cycle=(n_gen - 1) / cycles if cycles else float("nan"),
        )
