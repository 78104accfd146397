"""Continuous-batching serving scheduler (TPU-native runtime layer).

The reference serves generation as one-shot batch scripts
(scripts/generate.py: fixed batch, every sequence runs to the same length;
a short request waits for the longest). This scheduler keeps a fixed pool
of S decode SLOTS on the chip and streams requests through them
continuously: when a request finishes, its slot is re-filled from the queue
while the other slots keep decoding — aggregate throughput stays at the
serving roofline (BENCHMARKS.md B16 table) instead of draining to the
slowest request.

TPU-first design (block-synchronous continuous batching):
  * All shapes are static: S slots, fixed prompt window, fixed decode
    CHUNK. One compiled prefill (batch 1) + one compiled chunk program —
    no recompiles at admission time, ever.
  * The chunk program advances ALL slots `chunk` tokens in one jitted
    lax.scan (the same 'combined'-mode sampler body as
    sample/sampler.sample_tokens — grammar filter, tick-window penalty,
    top-k pick). Between chunks the host retires finished requests and
    admits queued ones by writing their prefilled state into the slot
    arrays (jitted dynamic_update_index_in_dim, donated buffers).
  * Per-request RNG is folded from the request seed and the request-local
    step index, so a request's stream is a pure function of
    (params, prompt, seed) — independent of which slot it lands in or what
    shares the batch. Greedy streams equal sample/sampler.generate exactly;
    tests/test_serve.py asserts both properties.
  * All three generator families serve. The recurrent models (mamba,
    xlstm) batch trivially — their step is position-independent. The
    transformer runs a batched-geometry ring-KV step (per-row write slot +
    (B, S) key ages derived from each slot's local step count;
    models/transformer.py MultiHeadAttention.step) so slots at different
    stream offsets share one compiled step. rel_base is the fixed
    streaming-geometry constant, so it stays scalar.

Admission latency is bounded by one chunk (chunk=32 ≈ 10 ms at the
measured ~300 us/token step); idle slots decode garbage that is discarded
on retire — the standard continuous-batching trade, tunable via `chunk`.

Multi-chip: pass `mesh=` (a ('data','model') mesh) to shard the slot pool
over the 'data' axis — params replicate, each chip decodes its slot shard
at the per-chip weight-stream roofline, and aggregate throughput scales
with the axis size. The XLA step shards under plain GSPMD; the fused
Pallas chunk (which GSPMD cannot auto-partition) runs inside shard_map
with every batch-leading slot-state leaf split over 'data' and the weight
pack replicated — so multi-chip serving keeps the fused-kernel decode
rate. Streams are bit-identical to the single-chip scheduler because
per-request RNG never depends on slot or batch composition
(tests/test_serve.py pins both paths on the 8-device virtual mesh).
"""
from __future__ import annotations

import functools
import time
import warnings
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VOCAB, VocabLayout
from ..sample.sampler import (
    SamplerConfig,
    _pick_next,
    _sample_k,
    filtered_logits,
    init_penalty_state,
    make_sampler,
    penalty_divisor,
    push_token,
)


@dataclass
class Request:
    """One generation request: fixed-window prompt + token budget."""

    prompt: np.ndarray  # (prompt_len,) int32 — scheduler's fixed window
    meta: np.ndarray  # (NUM_META,) int32
    num_tokens: int
    seed: int = 0
    rid: int = -1
    tokens: List[int] = field(default_factory=list)
    # Serving latency accounting (host wall clock; filled by the scheduler).
    t_submit: float = 0.0
    t_admit: float = 0.0
    t_first: float = 0.0  # first chunk containing this request's tokens
    t_done: float = 0.0


class BatchScheduler:
    """Slot-based continuous batching over a recurrent decode state.

    Usage:
        sched = BatchScheduler(model, params, "mamba", slots=8)
        ids = [sched.submit(prompt, meta, n) for ...]
        results = sched.run()        # {rid: np.ndarray of tokens}
    """

    def __init__(
        self,
        model,
        params,
        kind: str,
        prompt_len: int = 2048,
        slots: int = 8,
        chunk: int = 32,
        block_len: int = 2048,
        greedy: bool = False,
        layout: VocabLayout = VOCAB,
        fused: Optional[bool] = None,
        quant: str = "bf16",
        mesh=None,
    ):
        if kind not in ("mamba", "xlstm", "transformer"):
            raise ValueError(f"unknown model kind: {kind!r}")
        # quant may carry an '-sb16' suffix (xLSTM only): store the mLSTM
        # matrix memory bf16 inside the fused chunk, halving its
        # ~113 MB/token HBM stream (ops/pallas_xlstm_decode docstring).
        self._state_bf16 = quant.endswith("-sb16")
        if self._state_bf16:
            if kind != "xlstm":
                raise ValueError("'-sb16' state storage is an xLSTM option")
            quant = quant[: -len("-sb16")]
        self.kind = kind
        self.model = model
        self.params = params
        self.prompt_len = prompt_len
        self.slots = slots
        self.chunk = chunk
        self.greedy = greedy
        self.layout = layout
        self.cfg = SamplerConfig(
            num_tokens=chunk, greedy=greedy, ring_size=max(block_len, 2048)
        )
        # Multi-chip serving: every slot-state array is batch-leading, so a
        # ('data',) mesh shards the slot pool across chips under GSPMD —
        # each chip decodes slots/|data| sequences against its own replica
        # of the weights (per-chip weight-stream roofline; aggregate scales
        # linearly, same argument as parallel/serving.py). Per-request RNG
        # is slot-independent, so streams are bit-identical to the
        # single-chip scheduler (tests/test_serve.py pins this on the
        # 8-device virtual mesh). Pallas kernels do not auto-partition
        # under GSPMD, so the mesh path serves the XLA step.
        self.mesh = mesh
        if mesh is not None:
            data = mesh.shape["data"]
            if slots % data:
                raise ValueError(
                    f"slots {slots} must divide the 'data' axis ({data})"
                )
            if fused and mesh.shape.get("model", 1) > 1:
                raise ValueError(
                    "fused decode kernels serve data-parallel only; use a "
                    "mesh with model axis 1 (or fused=False for TP)"
                )
            # Pallas kernels do not auto-partition under GSPMD; the fused
            # mesh path instead wraps the chunk program in shard_map over
            # 'data' — every slot-state leaf is batch-leading, so each chip
            # runs the whole kernel on its slots/|data| shard against a
            # replicated weight pack (per-chip weight-stream roofline,
            # aggregate scales with the axis — tests/test_serve.py pins
            # stream equality on the virtual mesh). fused=None keeps the
            # same auto policy as single-chip.
            from ..parallel.mesh import batch_sharding, param_shardings

            self._slot_sharding = batch_sharding(mesh)
            self.params = params = jax.device_put(
                params, param_shardings(params, mesh)
            )
        # Chunk decode through the fused full-model kernel (same policy as
        # sample.generate: mamba wins on accelerators). Slot state stays in
        # MODEL format (batch-leading — the insert/tile logic needs it);
        # _jit_chunk converts to the kernel's stacked layout at the chunk
        # edges, ~0.6 MB/step amortized against the 166 MB weight stream.
        # Kernel batch = slots on one chip, the per-chip slot shard under a
        # mesh (the shard_map body sees local shapes).
        self._kernel_slots = (
            slots // mesh.shape["data"] if mesh is not None else slots
        )
        if fused is None:
            # Same auto policy as sample.generate: mamba's kernel wins on
            # accelerators outright; the xLSTM kernel pays only when int8w
            # halves the weight stream (its XLA step is ~96% of roofline at
            # bf16 — BENCHMARKS.md). The xLSTM kernel additionally must FIT:
            # its mLSTM matrix-memory windows scale with the kernel batch
            # (4 x 2048 x B*512 x state bytes of VMEM), so a full 8-slot
            # f32-state pool blows the 128 MiB ceiling that a 2-row
            # sampling call fits easily (measured:
            # experiments/r4/serve_xlstm_int8w.log, 166.71M/128M). The
            # estimator routes such configs to the XLA step instead of
            # crashing the compile.
            accel = jax.default_backend() != "cpu"
            fused = accel and (
                (
                    kind == "mamba"
                    and not getattr(getattr(model, "cfg", None), "residual", False)
                )
                or (
                    kind == "xlstm"
                    and (quant in ("int8", "int8w") or self._state_bf16)
                    and self._xlstm_kernel_fits(params, quant)
                )
            )
        self._fused = fused and kind in ("mamba", "xlstm")
        self.quant = quant
        self._fused_pack = None
        if self._fused and kind == "mamba":
            from ..ops.pallas_decode import build_decode_params

            self._fused_pack = build_decode_params(
                params, model.cfg, self._kernel_slots, quant=quant
            )
        elif self._fused:
            from ..ops.pallas_xlstm_decode import build_xlstm_decode_params

            self._fused_pack = build_xlstm_decode_params(
                params, model.cfg, self._kernel_slots,
                quant="int8w" if quant in ("int8", "int8w") else "bf16",
            )
        if self._fused and mesh is not None:
            from ..parallel.mesh import replicated

            self._fused_pack = jax.device_put(
                self._fused_pack, replicated(mesh)
            )
        self._prefill, self._step = make_sampler(model, kind, block_len)
        if kind == "transformer":
            # Per-slot stream offsets: each slot's ring-KV geometry (write
            # slot, key ages) is a pure function of that slot's local step
            # count, so the batched step (models/transformer.py step with
            # (B,) slot + (B, S) ages) lets rows sit at DIFFERENT offsets —
            # the continuous-batching requirement the scalar-offset sampler
            # step can't meet. rel_base is the fixed streaming-geometry
            # constant (sample/cache.step_geometry), identical across rows.
            from ..models.transformer import TransformerLM
            from ..sample.cache import step_geometry, token_slot

            phys = model.cfg.seq_len
            blen, plen, mdl = block_len, prompt_len, model

            def _t_step(p, token, caches, lstep):
                total = plen + lstep + 1  # (S,) per-slot stream length
                ages, rel_base = jax.vmap(
                    lambda t: step_geometry(t, blen), out_axes=(0, None)
                )(total)
                if ages.shape[1] < phys:
                    ages = jnp.pad(
                        ages, ((0, 0), (0, phys - ages.shape[1])),
                        constant_values=-1,
                    )
                slot = token_slot(total - 1, blen)
                return mdl.apply(
                    p, token, caches, slot, ages, rel_base,
                    method=TransformerLM.step,
                )

            self._step = _t_step
        self._queue: deque[Request] = deque()
        self._active: Dict[int, Request] = {}  # slot -> request
        self._requests: Dict[int, Request] = {}  # rid -> request (all)
        self._remaining = np.zeros(slots, np.int64)
        self._next_rid = 0
        self._state = None  # stacked slot state (built lazily)

    # -- public API ---------------------------------------------------------

    def submit(self, prompt, meta, num_tokens: int, seed: int = 0) -> int:
        prompt = np.asarray(prompt, np.int32)
        if prompt.shape != (self.prompt_len,):
            raise ValueError(
                f"prompt must be the scheduler's fixed ({self.prompt_len},) "
                f"window (reference crops/pads to the model window too — "
                f"processing/dataset.py); got {prompt.shape}"
            )
        req = Request(prompt, np.asarray(meta, np.int32), int(num_tokens),
                      seed=seed, rid=self._next_rid)
        req.t_submit = time.perf_counter()
        self._next_rid += 1
        self._queue.append(req)
        self._requests[req.rid] = req
        return req.rid

    def run(self) -> Dict[int, np.ndarray]:
        """Drive chunks until queue and slots drain; returns id -> tokens."""
        done: Dict[int, np.ndarray] = {}
        self._admit_all()
        while self._active:
            tokens = self._run_chunk()  # (S, chunk) int32, host
            now = time.perf_counter()
            for s, req in list(self._active.items()):
                if not req.tokens:
                    req.t_first = now
                take = min(self.chunk, req.num_tokens - len(req.tokens))
                req.tokens.extend(int(t) for t in tokens[s, :take])
                if len(req.tokens) >= req.num_tokens:
                    req.t_done = now
                    done[req.rid] = np.asarray(req.tokens, np.int32)
                    del self._active[s]
            self._admit_all()
        return done

    def stats(self) -> Dict[int, Dict[str, float]]:
        """Per-request serving latency: queue wait, time-to-first-chunk,
        total wall, effective tok/s (completed requests only)."""
        out = {}
        for rid, r in self._requests.items():
            if not r.t_done:
                continue
            out[rid] = {
                "queue_wait_s": r.t_admit - r.t_submit,
                "ttfc_s": r.t_first - r.t_submit,
                "wall_s": r.t_done - r.t_submit,
                "tokens": float(r.num_tokens),
                "tok_per_s": r.num_tokens / max(r.t_done - r.t_admit, 1e-9),
            }
        return out

    # -- internals ----------------------------------------------------------

    def _zero_slot_state(self):
        """Initial S-slot stacked state: prefill a zero prompt once and
        broadcast — gives correctly-shaped state arrays cheaply."""
        z_prompt = jnp.zeros((1, self.prompt_len), jnp.int32)
        z_meta = jnp.zeros((1, self._meta_width), jnp.int32)
        logits, mstate = self._jit_prefill(self.params, z_prompt, z_meta)
        tile = lambda x: jnp.broadcast_to(
            x, (self.slots,) + x.shape[1:]
        ).copy() if hasattr(x, "shape") else x
        pen = init_penalty_state(
            jnp.zeros((self.slots, self.prompt_len), jnp.int32),
            self.cfg.ring_size, self.layout,
        )
        state = {
            "logits": tile(logits),
            "model": jax.tree.map(tile, mstate),
            "pen": pen,
            "last": jnp.zeros((self.slots,), jnp.int32),
            "key": jnp.stack([jax.random.PRNGKey(0)] * self.slots),
            "lstep": jnp.zeros((self.slots,), jnp.int32),
        }
        if self.mesh is not None:
            state = jax.tree.map(
                lambda x: jax.device_put(x, self._slot_sharding), state
            )
        return state

    @functools.cached_property
    def _meta_width(self):
        from ..config import NUM_META

        return NUM_META

    @functools.cached_property
    def _jit_prefill(self):
        return jax.jit(self._prefill)

    @functools.cached_property
    def _jit_insert(self):
        def insert(state, s, logits, mstate, pen, last, key):
            upd = lambda full, new: jax.lax.dynamic_update_index_in_dim(
                full, new.astype(full.dtype), s, 0
            )
            out = dict(state)
            out["logits"] = upd(state["logits"], logits[0])
            out["model"] = jax.tree.map(
                lambda f, n: upd(f, n[0]), state["model"], mstate
            )
            out["pen"] = jax.tree.map(
                lambda f, n: upd(f, n[0]), state["pen"], pen
            )
            out["last"] = upd(state["last"], last)
            out["key"] = upd(state["key"], key)
            out["lstep"] = upd(state["lstep"], jnp.int32(0))
            return out

        return jax.jit(insert, donate_argnums=(0,))

    @functools.cached_property
    def _jit_chunk(self):
        cfg, layout, step_fn = self.cfg, self.layout, self._step
        interp = jax.default_backend() == "cpu"
        if self._fused and self.kind == "mamba":
            from ..ops.pallas_decode import (
                DecodeDims,
                fused_logits_step,
                stack_states,
                unstack_states,
            )

            mcfg = self.model.cfg
            dims = DecodeDims.create(mcfg, self._kernel_slots)
            qmode = "w8a16" if self.quant in ("int8", "int8w") else "w8a8"

            def step_fn(pack, token, mstate, si):
                return fused_logits_step(
                    pack, token, mstate, mcfg, dims, quant_mode=qmode,
                    interpret=interp,
                )

            to_kernel = lambda st: stack_states(st)
            from_kernel = lambda cv_ss: unstack_states(*cv_ss, dims)
        elif self._fused:
            from ..ops.pallas_xlstm_decode import (
                XDims,
                fused_xlstm_logits_step,
                stack_xlstm_states,
                unstack_xlstm_states,
            )

            xcfg = self.model.cfg
            xdims = XDims.create(xcfg, self._kernel_slots)
            slots = self._kernel_slots
            sdt = jnp.bfloat16 if self._state_bf16 else jnp.float32

            def step_fn(pack, token, carry, si):
                return fused_xlstm_logits_step(
                    pack, token, carry, xcfg, xdims, interpret=interp
                )

            to_kernel = lambda st: stack_xlstm_states(
                st, xcfg, slots, state_dtype=sdt
            )
            from_kernel = lambda packs: unstack_xlstm_states(
                packs, xcfg, slots
            )
        else:
            to_kernel = from_kernel = lambda st: st

        def chunk(params, state):
            def body(carry, _):
                logits, mstate, pen, last, keys, lstep = carry
                # Per-slot RNG: request seed folded with the request-LOCAL
                # step — slot- and batch-composition-independent.
                step_keys = jax.vmap(jax.random.fold_in)(keys, lstep)
                k_key, pick_key = jnp.moveaxis(
                    jax.vmap(jax.random.split)(step_keys), 1, 0
                )
                k = jax.vmap(
                    lambda l, kk: _sample_k(l[None], kk, layout)[0]
                )(last, k_key)
                w = filtered_logits(last, logits, layout)
                w = w / penalty_divisor(pen.hist, layout)
                nxt = jax.vmap(
                    lambda wi, ki, pk: _pick_next(
                        wi[None], ki[None], pk, cfg.max_topk, cfg.greedy
                    )[0]
                )(w, k, pick_key)
                pen = push_token(pen, nxt, layout)
                logits, mstate = step_fn(params, nxt, mstate, lstep)
                return (logits, mstate, pen, nxt, keys, lstep + 1), nxt

            carry0 = (
                state["logits"], to_kernel(state["model"]), state["pen"],
                state["last"], state["key"], state["lstep"],
            )
            carry, toks = jax.lax.scan(body, carry0, None, length=self.chunk)
            logits, mstate, pen, last, keys, lstep = carry
            out = {
                "logits": logits, "model": from_kernel(mstate), "pen": pen,
                "last": last, "key": keys, "lstep": lstep,
            }
            return out, toks.transpose(1, 0)  # (S, chunk)

        if self.mesh is not None and self._fused:
            # Manual data parallelism for the Pallas chunk: every slot-state
            # leaf is batch-leading, so P('data') prefixes shard the pool
            # and each device runs the whole fused kernel on its local
            # slots (the pack is replicated). Streams stay bit-identical
            # because per-request RNG ignores slot/batch composition.
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            chunk = shard_map(
                chunk, mesh=self.mesh,
                in_specs=(P(), P("data")),
                out_specs=(P("data"), P("data")),
                check_rep=False,
            )

        return jax.jit(chunk, donate_argnums=(1,))

    def _admit_all(self):
        if self._state is None:
            self._state = self._zero_slot_state()
        free = [s for s in range(self.slots) if s not in self._active]
        for s in free:
            if not self._queue:
                break
            req = self._queue.popleft()
            req.t_admit = time.perf_counter()
            prompt = jnp.asarray(req.prompt)[None]
            meta = jnp.asarray(req.meta)[None]
            logits, mstate = self._jit_prefill(self.params, prompt, meta)
            pen = init_penalty_state(prompt, self.cfg.ring_size, self.layout)
            self._state = self._jit_insert(
                self._state, jnp.int32(s), logits, mstate, pen,
                prompt[0, -1], jax.random.PRNGKey(req.seed),
            )
            self._active[s] = req

    def _xlstm_kernel_fits(self, params, quant: str) -> bool:
        from ..ops.pallas_xlstm_decode import fused_vmem_fits

        return fused_vmem_fits(
            params, self.model.cfg, self._kernel_slots, quant=quant,
            state_dtype=jnp.bfloat16 if self._state_bf16 else jnp.float32,
        )

    def _run_chunk(self) -> np.ndarray:
        p = self._fused_pack if self._fused else self.params
        try:
            self._state, toks = self._jit_chunk(p, self._state)
        except Exception as e:  # noqa: BLE001 — gated on the OOM signature
            msg = str(e)
            oom = (
                "memory space vmem" in msg
                or "Ran out of memory" in msg
                or "RESOURCE_EXHAUSTED" in msg
            )
            if not (self._fused and oom):
                raise
            # The fused kernel's VMEM windows did not fit at this slot
            # count (compile-time Mosaic OOM — the estimator's ceiling is
            # a heuristic, explicit fused=True bypasses it entirely).
            # Slot state lives in model format between chunks, so falling
            # back is just rebuilding the chunk program around the XLA
            # step; requests in flight lose nothing.
            warnings.warn(
                "fused decode kernel exceeded VMEM at "
                f"slots={self._kernel_slots}; falling back to the XLA "
                f"step path ({e!s:.200})"
            )
            self._fused = False
            self._fused_pack = None
            self.__dict__.pop("_jit_chunk", None)  # cached_property reset
            self._state, toks = self._jit_chunk(self.params, self._state)
        return np.asarray(toks)
