"""The A-LINK / A2-LINK framework loop.

Reference: ``code/ALINK.py:145-259`` (identically ``ALINK_arc.py:142-254``;
cross-resolution variant ``ALINK_MTP.py:153-263``).  Per slab of
``alink_bs`` unlabeled persons:

1. build the all-pairs mini-batch (plain x disguised + disguised x
   disguised, ``readDFW.createMiniBatch``) — its ground-truth labels act as
   the pseudo-oracle (ALINK.py:152-153);
2. featurize and get committee (M1) predictions (ALINK.py:157-160);
3. perturb the raw pairs with every noise channel, targeted by M1's labels
   (ALINK.py:163-164);
4. student (M2) predictions per channel (ALINK.py:167-170);
5. disparity selection, all-noise intersection, oracle gate
   (``active.selection``);
6. queue equal per-noise shares of the queried pairs (ALINK.py:216-225 —
   implemented without the reference's index slip, per SURVEY.md section 7);
7. when the queue reaches ``batch_send``: mix in ``mixture_ratio`` replay
   batches (and optionally augmented clean pairs), finetune M2
   (ALINK.py:227-253), flush;
8. stop once ACTIVE_COUNT >= active_ratio * UN_SIZE (ALINK.py:255-259).

Architecture: the host orchestrates; every numbered step is a fixed-shape
device computation.  Loop state (M2 params + counters + queue) is an
explicit checkpointable object — the reference loses all of it on
interruption (SURVEY.md section 5.4).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from alink_tpu import train as T
from alink_tpu.active.committee import Committee
from alink_tpu.active.selection import select_queries
from alink_tpu.config import ALinkConfig
from alink_tpu.data.loader import PersonStacks
from alink_tpu.data.pairs import all_pairs_index
from alink_tpu.ops.augment import augment_pairs
from alink_tpu.ops.image import resize
from alink_tpu.ops.pairwise import pair_scores
from alink_tpu.utils.debug import check_finite
from alink_tpu.utils.dispatch import resolve_device_batch
from alink_tpu.utils.profiling import Timings


@dataclasses.dataclass
class ALinkState:
    """Checkpointable loop state (greenfield; SURVEY.md section 5.4)."""

    m2_state: T.TrainState
    active_count: int = 0
    un_size: int = 0
    pool_cursor: int = 0  # person index into the unlabeled pool
    replay_draws: int = 0  # batches consumed from replay_gen (for resume)
    buffer_left: np.ndarray | None = None
    buffer_right: np.ndarray | None = None
    buffer_y: np.ndarray | None = None

    def buffer_size(self) -> int:
        return 0 if self.buffer_y is None else int(len(self.buffer_y))

    def append_buffer(self, left, right, y):
        if self.buffer_size() == 0:
            self.buffer_left = np.asarray(left)
            self.buffer_right = np.asarray(right)
            self.buffer_y = np.asarray(y)
        else:
            self.buffer_left = np.concatenate([self.buffer_left, left])
            self.buffer_right = np.concatenate([self.buffer_right, right])
            self.buffer_y = np.concatenate([self.buffer_y, y])

    def flush_buffer(self):
        self.buffer_left = self.buffer_right = self.buffer_y = None


def _next_pow2(n: int) -> int:
    """Smallest power of two >= n (>= 1) — the shape-bucketing policy.

    Bucketed widths bound distinct compiled programs at log2(max width)
    and padding waste at <2x; every bucketing site in the loop must use
    the same policy or a missed one silently reintroduces per-iteration
    retraces (seconds each — see run_iteration's chunk-width comment).
    """
    b = 1
    while b < n:
        b *= 2
    return b


class IterationLog(NamedTuple):
    iteration: int
    pairs: int
    selected: int
    queried: int
    active_count: int
    un_size: int
    finetuned: bool


class ALinkLoop:
    """Host orchestrator of the A-LINK loop.

    Args:
        config: knobs mirroring the reference flags (config.ALinkConfig).
        featurize: batched ``(N, H, W, C) -> (N, D)`` embedding fn for M1
            (the ``conversionModel.process`` role, ALINK.py:157).
        committee: the M1 ensemble over feature pairs.
        m2_state: the student's TrainState (feature-space SiameseHead, or
            SmallRes for the raw-pixel MTP student).
        student_featurize: the student's input transform on noisy images.
            ``"same"`` (default) reuses ``featurize`` — the DFW drivers,
            where M1 and M2 share the backbone (ALINK.py:167).  ``None``
            feeds raw pixels resized to ``student_res`` — the MTP
            cross-resolution student (ALINK_MTP.py:164-165, 222).
        student_res: ``(h, w)`` resolution noisy pairs are resized to
            before the student sees them (IMAGERES in ALINK.py:164;
            lowRes in MTP).  Defaults to ``config.image_res`` flipped —
            the config field follows the loader's cv2 ``(w, h)``
            convention (data/loader.py:66) while this (and ops.image.
            resize) is array-shaped ``(h, w)``.
        replay_gen: iterator of ``((left, right), y)`` clean batches in the
            *student's input space* for forgetting mitigation (the
            ``dataGen`` mixed in at ALINK.py:233-239).
        adversarial_predict: end-to-end ``(m2_params, left, right) -> (N, 2)``
            raw-pair probability fn for the one-pixel attack channel
            (noise.py:153-168); required when "adversarial" is in the noise
            bank.  The loop threads the live M2 params through on every
            iteration.

    The fused chunk program caches its trace: params are threaded as
    arguments, but the callables (``featurize``, ``student_featurize``,
    ``adversarial_predict``, ...) are closed over.  Reassigning any of
    them after the first chunk invalidates the cache — ``__setattr__``
    drops the cached trace automatically so the next chunk retraces.
    """

    # Attributes the cached chunk trace closes over; reassigning one
    # must invalidate the trace (see __setattr__).
    _TRACED_ATTRS = frozenset({
        "featurize", "student_featurize", "student_is_head", "student_res",
        "committee", "adversarial_predict", "adversarial_kwargs",
    })

    def __setattr__(self, name, value):
        if (name in self._TRACED_ATTRS
                and getattr(self, "_chunk_jit", None) is not None):
            super().__setattr__("_chunk_jit", None)
        super().__setattr__(name, value)

    def __init__(
        self,
        config: ALinkConfig,
        *,
        featurize: Callable,
        committee: Committee,
        m2_state: T.TrainState,
        student_featurize: Callable | str | None = "same",
        student_is_head: bool = True,
        student_res: tuple[int, int] | None = None,
        replay_gen: Iterator | None = None,
        adversarial_predict: Callable | None = None,
        adversarial_kwargs: dict | None = None,
        pair_builder: Callable = all_pairs_index,  # -> (pool, li, ri, y)
        metrics=None,
        device_batch: int | None = None,
        pool_uint8: bool = False,
        key: jax.Array | None = None,
    ):
        self.pair_builder = pair_builder
        self.metrics = metrics  # optional utils.metrics.MetricsLogger
        # Pairs processed per device pass; bounds HBM regardless of the
        # all-pairs batch size (reference predict bs, siamese.py:131).
        # None -> config.device_batch (see its tradeoff note in config.py);
        # getattr so externally defined config dataclasses keep working.
        # "auto" resolves here, once, via the dispatch-latency probe.
        self.device_batch = resolve_device_batch(
            device_batch if device_batch is not None
            else getattr(config, "device_batch", 1024))
        self.config = config
        self.featurize = featurize
        self.student_featurize = (
            featurize if student_featurize == "same" else student_featurize
        )
        self.student_is_head = student_is_head
        self.student_res = (
            tuple(student_res) if student_res is not None
            # config.image_res is cv2 (w, h); resize wants (h, w).
            else (config.image_res[1], config.image_res[0])
        )
        self.committee = committee
        self.replay_gen = replay_gen
        # Upload the pair pool as uint8 when the source data is
        # cv2-decoded uint8 (all reference datasets, readDFW.py:82):
        # 4x less host->device traffic; the f32 cast happens on device.
        self.pool_uint8 = pool_uint8
        self.adversarial_predict = adversarial_predict
        self.adversarial_kwargs = adversarial_kwargs
        self.key = key if key is not None else jax.random.PRNGKey(config.seed)
        # Opt-in NaN/Inf sanitizer on the selection/finetune phases
        # (utils/debug.py; config.debug_nans).
        self._nan_guard = bool(getattr(config, "debug_nans", False))
        self.state = ALinkState(m2_state=m2_state)
        self._chunk_jit = None  # built lazily; see _process_chunk
        self._replay_consumed = 0  # batches served by replay_gen (resume)
        self.logs: list[IterationLog] = []
        # Iterations completed before the last restore(): keeps resumed
        # IterationLog.iteration indices continuing the interrupted run's
        # metrics stream instead of colliding with its records at 0..N.
        self._iteration_offset = 0
        # Per-phase wall-clock accounting (SURVEY.md section 5.1 — the
        # reference has no tracing at all); read loop.timings.report().
        self.timings = Timings()

    # -- helpers ---------------------------------------------------------

    def _next_key(self) -> jax.Array:
        self.key, k = jax.random.split(self.key)
        return k

    def _student_inputs(self, left_imgs, right_imgs):
        """Images (already at student_res) -> student input space."""
        if self.student_featurize is None:
            return jnp.asarray(left_imgs), jnp.asarray(right_imgs)
        return (
            self.student_featurize(jnp.asarray(left_imgs)),
            self.student_featurize(jnp.asarray(right_imgs)),
        )

    def _student_probs(self, m2_params, left_in, right_in) -> jnp.ndarray:
        """M2 P(genuine) per pair (disguisedFacesModel.predict[:, 1]).

        ``student_is_head=True``: M2 is a feature-space SiameseHead and
        inputs are embeddings (the DFW drivers).  ``False``: M2 is a full
        image model (SmallRes, ALINK_MTP) applied to its inputs directly.
        """
        if not self.student_is_head:
            logits = self.state.m2_state.logits_fn(
                m2_params, left_in, right_in)
            return jax.nn.softmax(logits, axis=-1)[:, 1]
        return pair_scores(m2_params, left_in, right_in)

    # -- one slab --------------------------------------------------------

    def _chunk_impl(self, m2_params, committee_params, key, pool, left_idx,
                    right_idx):
        """One fixed-size pair chunk as a single traced program: pool
        gather + M1 features/probs + noise fan-out + student probs.

        Fusing the whole pass into ONE dispatch matters twice over: every
        launch+fetch through a remote-device tunnel costs tens of ms
        (measured: the phase-by-phase version spent ~1.5 s/round on
        dispatch latency alone), and XLA only fuses/pipelines across
        stage boundaries it can see in one program.  The image pool stays
        uint8-resident; pairs materialise as in-program gathers."""
        left_raw = jnp.take(pool, left_idx, axis=0).astype(jnp.float32)
        right_raw = jnp.take(pool, right_idx, axis=0).astype(jnp.float32)
        fl = self.featurize(left_raw)
        fr = self.featurize(right_raw)
        m1_probs2 = self.committee.predict_with(committee_params, fl, fr)
        m1_labels = jax.nn.one_hot(jnp.argmax(m1_probs2, axis=-1), 2)

        # Noise fan-out on raw pixels, resized to the student's resolution
        # (ALINK.py:163-164; ALINK_MTP.py:164-165).  The attack targets the
        # LIVE student params (PredictionWrappedModel holds the mutable
        # model, noise.py:153-168).
        noisy_l, noisy_r = self.committee.attack_model(
            key,
            left_raw,
            right_raw,
            self.student_res,
            m1_labels=m1_labels,
            adversarial_predict=self.adversarial_predict,
            adversarial_params=m2_params,
            adversarial_kwargs=self.adversarial_kwargs,
        )
        k_noise, nc = noisy_l.shape[0], noisy_l.shape[1]

        # Student under every channel (ALINK.py:167-170), all K channels as
        # ONE flattened batch (the reference re-featurizes channel by
        # channel, ALINK.py:167).
        flat_l = noisy_l.reshape((-1,) + noisy_l.shape[2:])
        flat_r = noisy_r.reshape((-1,) + noisy_r.shape[2:])
        sli, sri = self._student_inputs(flat_l, flat_r)
        flat_probs = self._student_probs(m2_params, sli, sri)  # (K*nc,)
        # Probabilities stay on device; the caller concatenates across
        # chunks and fetches once (each host fetch is a full round trip).
        return (
            m1_probs2[:, 1],
            flat_probs.reshape(k_noise, nc),
            sli.reshape((k_noise, nc) + sli.shape[1:]),
            sri.reshape((k_noise, nc) + sri.shape[1:]),
        )

    def _process_chunk(self, pool, left_idx, right_idx):
        """Jitted-once wrapper of ``_chunk_impl``; the mutable student and
        committee params and the RNG key flow through as arguments, so
        per-round finetunes (or committee refreshes) never retrace and are
        never served from stale trace-time constants.

        The one callable that lives on mutable state rather than on self
        is the student's ``logits_fn`` (student_is_head=False path,
        ``_student_probs``) — ``__setattr__``'s _TRACED_ATTRS guard can't
        see ``self.state`` reassignments (state changes every finetune;
        blanket invalidation would retrace every round), so its identity
        is checked here and a swap of the student MODEL (not its params)
        drops the cached trace."""
        lf = (None if self.student_is_head
              else self.state.m2_state.logits_fn)
        if lf is not getattr(self, "_trace_logits_fn", None):
            self._chunk_jit = None
        if self._chunk_jit is None:
            self._trace_logits_fn = lf
            self._chunk_jit = jax.jit(self._chunk_impl)
        # NOTE: deliberately NOT blocked — chunks pipeline their async
        # dispatch (probabilities stay device-resident; one fetch at
        # selection), so "chunk" records dispatch time and the device
        # cost lands in "select"'s first fetch.
        with self.timings.phase("chunk"):
            return self._chunk_jit(self.state.m2_state.params,
                                   self.committee.params,
                                   self._next_key(), pool,
                                   left_idx, right_idx)

    def run_iteration(
        self,
        plain_part: PersonStacks,
        dig_part: PersonStacks,
    ) -> IterationLog:
        cfg = self.config
        with self.timings.phase("pairs"):
            # Pairs as index space (SURVEY.md section 7): the image pool
            # uploads ONCE; every pair materialises as a device gather.
            flat_images, left_idx, right_idx, y = self.pair_builder(
                plain_part, dig_part)
            # The pool is an argument of the fused chunk program, so its
            # row count is part of the compiled signature: bucket it up to
            # a multiple of 64 so varying per-iteration pool sizes reuse
            # one compilation instead of retracing.
            pool_np = np.asarray(flat_images)
            bucket = -(-pool_np.shape[0] // 64) * 64
            pad = ((0, bucket - pool_np.shape[0]),) + ((0, 0),) * (
                pool_np.ndim - 1)
            if self.pool_uint8:
                # The pool stays uint8-resident end to end (4x less
                # host->device traffic AND 4x less HBM); the f32 cast
                # happens inside the chunk program after the pair gather.
                pool = jnp.asarray(np.pad(
                    np.clip(pool_np, 0, 255).astype(np.uint8), pad))
            else:
                pool = jnp.asarray(np.pad(pool_np, pad))
        n = len(y)
        if n == 0:
            raise ValueError(
                "pair_builder produced an empty slab (0 pairs) — every "
                "slab part must contribute at least one person with "
                "images (check the manifest scan / part boundaries)")
        self.state.un_size += n  # ALINK.py:154

        # Device work runs over fixed-size pair chunks so HBM use is
        # bounded regardless of the all-pairs batch size (the reference
        # chunks its predicts at bs 1024 too, siamese.py:131); the final
        # chunk is padded to keep one compiled program.  The chunk width
        # is bucketed to a power of two (capped at device_batch):
        # min(device_batch, n) would give the fused chunk (committee +
        # noise + attack + student) a fresh input shape — and a seconds-
        # long retrace — every slab whose pair count differs, while
        # always padding to device_batch would run up to 2x-32x dead
        # pairs on small slabs.  Buckets bound the compile count at
        # log2(device_batch) and the padding waste at <2x.
        db = min(_next_pow2(min(self.device_batch, n)), self.device_batch)
        # Everything downstream of the chunks runs in PADDED pair space
        # (width n_chunks*db): slicing each chunk back to its real width
        # would make the select/pack programs' shapes track the exact
        # per-iteration pair count — a retrace every round the partition
        # sizes change.  Padding rows (chunk tails, duplicated last pair)
        # are carried as a validity mask instead and can never be
        # selected, queried, charged, or trained on.
        m1_chunks, probs_chunks, sl_chunks, sr_chunks = [], [], [], []
        chunk_spans = []          # (padded start, real width) per chunk
        lpad_parts, rpad_parts = [], []
        for ci, s in enumerate(range(0, n, db)):
            idx = np.arange(s, min(s + db, n))
            take = idx.size
            pad = db - take
            if pad:
                idx = np.concatenate([idx, np.full(pad, idx[-1])])
            m1c, pc, slc, src = self._process_chunk(
                pool,
                jnp.asarray(left_idx[idx]),
                jnp.asarray(right_idx[idx]),
            )
            m1_chunks.append(m1c)
            probs_chunks.append(pc)
            sl_chunks.append(slc)   # device, padded — gathered post-select
            sr_chunks.append(src)
            chunk_spans.append((ci * db, take))
            lpad_parts.append(left_idx[idx])
            rpad_parts.append(right_idx[idx])
        m1_genuine = jnp.concatenate(m1_chunks)
        student_probs = jnp.concatenate(probs_chunks, axis=1)  # (K, n_pad)
        if self._nan_guard:
            # Catch a diverged committee/student or a degenerate noise
            # channel HERE, before its probabilities drive selection.
            check_finite((m1_genuine, student_probs),
                         "selection probabilities", force=True)
        k_noise = student_probs.shape[0]
        n_pad = int(m1_genuine.shape[0])
        valid_np = np.zeros(n_pad, np.bool_)
        y_pad = np.zeros(n_pad, np.float32)
        for (ps, take) in chunk_spans:
            valid_np[ps:ps + take] = True
        y_pad[valid_np] = np.asarray(y, np.float32)
        left_idx_pad = np.concatenate(lpad_parts)
        right_idx_pad = np.concatenate(rpad_parts)

        def gather_student_all(shares: list[np.ndarray]):
            """Fetch student inputs for every noise channel's selected rows
            in ONE host transfer per chunk (each host fetch is a full
            round trip — batching them matters enormously on high-latency
            links and still saves dispatches on local hosts).

            ``shares[k]``: global pair rows charged to channel k.  Returns
            ``(ls, rs)`` lists indexed by channel."""
            parts = [[] for _ in shares]
            for (start, take), slc, src in zip(chunk_spans, sl_chunks,
                                               sr_chunks):
                sel_k, sel_local = [], []
                for k, rows in enumerate(shares):
                    local = rows[(rows >= start) & (rows < start + take)]
                    sel_k.append(np.full(local.size, k))
                    sel_local.append(local - start)
                counts = [s.size for s in sel_local]
                w = sum(counts)
                if not w:
                    continue
                # Bucket the gather width to a power of two: the index
                # width is part of the device gather's compiled signature,
                # and the per-channel share counts vary every iteration —
                # unbucketed, each round paid a multi-second retrace of
                # this one gather (measured ~4.3 s/iter on chip vs ~50 ms
                # warm).  Pad with (0, 0) — any valid index — and slice
                # the padding off host-side after the transfer.
                bw = _next_pow2(w)
                kk_np = np.concatenate(sel_k)
                ll_np = np.concatenate(sel_local)
                if bw > w:
                    kk_np = np.concatenate(
                        [kk_np, np.zeros(bw - w, kk_np.dtype)])
                    ll_np = np.concatenate(
                        [ll_np, np.zeros(bw - w, ll_np.dtype)])
                kk = jnp.asarray(kk_np)
                ll = jnp.asarray(ll_np)
                both = np.asarray(jnp.concatenate(
                    [slc[kk, ll], src[kk, ll]]))      # ONE fetch per chunk
                half = both.shape[0] // 2
                off = 0
                for k, cnt in enumerate(counts):
                    if cnt:
                        parts[k].append((both[off:off + cnt],
                                         both[half + off:half + off + cnt]))
                    off += cnt
            return [
                (np.concatenate([p[0] for p in ch]) if ch else None,
                 np.concatenate([p[1] for p in ch]) if ch else None)
                for ch in parts
            ]

        with self.timings.phase("select"):
            sel = select_queries(
                jnp.asarray(student_probs),
                jnp.asarray(m1_genuine),
                jnp.asarray(y_pad),
                disparity_ratio=cfg.disparity_ratio,
                blind_strategy=cfg.blind_strategy,
                eps=cfg.eps,
                valid=jnp.asarray(valid_np),
                # Host-exact take count (float64 int(n*ratio), the
                # reference's ALINK.py:181 semantics) as a traced scalar
                # so the padded program's shape stays n-independent.
                k_take=jnp.asarray(int(n * cfg.disparity_ratio), jnp.int32),
            )
        # All of the round's small selection outputs come back in ONE
        # packed host transfer (round trips, not bytes, dominate here).
        packed = np.asarray(jnp.concatenate([
            sel.queried.astype(jnp.float32),
            sel.pseudo_labels.astype(jnp.float32),
            sel.selected.astype(jnp.float32),
            jnp.array([sel.oracle_charges], jnp.float32),
        ]))
        queried_mask = packed[:n_pad]
        pseudo_all = packed[n_pad:2 * n_pad]
        selected_count = int(packed[2 * n_pad:3 * n_pad].sum())
        self.state.active_count += int(packed[-1])

        queried = np.flatnonzero(queried_mask)
        finetuned = False
        if queried.size:
            pseudo = pseudo_all[queried].astype(np.int32)
            # Equal per-noise shares of the queried set (ALINK.py:216-225,
            # with consistent indexing).
            mp = queried.size // k_noise
            if mp:
                # queried is ascending (np.flatnonzero), so each
                # contiguous share already is too — gather_student_all's
                # label alignment relies on exactly that ordering.
                shares = [queried[k * mp:(k + 1) * mp]
                          for k in range(k_noise)]
                gathered = gather_student_all(shares)
                for k, (ls, rs) in enumerate(gathered):
                    self.state.append_buffer(
                        ls, rs, pseudo[k * mp:(k + 1) * mp])
            if self.state.buffer_size() >= cfg.batch_send:
                finetuned = True
                with self.timings.phase("finetune") as ph:
                    # Clean raw pairs only for the queried rows (device
                    # gather from the resident pool).  The queried count
                    # varies every round, and it sets the input shape of
                    # the gather AND of _finetune's resize/featurize
                    # programs (the full teacher backbone) — so bucket it
                    # to a power of two (pad by repeating the last row;
                    # _finetune discards rows past ``valid`` after the
                    # device work) or every finetune event pays a
                    # multi-second featurizer retrace.
                    q = queried.size
                    bq = _next_pow2(q)
                    qidx = np.concatenate(
                        [queried, np.repeat(queried[-1:], bq - q)])
                    ql = pool[jnp.asarray(left_idx_pad[qidx])].astype(
                        jnp.float32)
                    qr = pool[jnp.asarray(right_idx_pad[qidx])].astype(
                        jnp.float32)
                    self._finetune(ql, qr, pseudo, valid=q)
                    # Charge the async-dispatched training step to THIS
                    # phase, not whichever phase fetches next.
                    ph.block_on(self.state.m2_state.params)

        log = IterationLog(
            iteration=self._iteration_offset + len(self.logs),
            pairs=n,
            selected=selected_count,
            queried=int(queried.size),
            active_count=self.state.active_count,
            un_size=self.state.un_size,
            finetuned=finetuned,
        )
        self.logs.append(log)
        if self.metrics is not None:
            # "Active Count so far" telemetry (ALINK.py:204), structured.
            self.metrics.log("alink_iteration", **log._asdict())
        return log

    def _finetune(self, left_raw, right_raw, pseudo, valid=None):
        """Buffer + clean/augment + replay mix, then finetune M2
        (ALINK.py:227-253).  ``left_raw``/``right_raw`` are the queried
        subset's raw pixels; their clean student-space versions are
        computed only on the non-augment path that uses them (the
        augment path re-featurizes from the augmented pixels instead).

        ``valid``: number of real rows in ``left_raw``/``right_raw`` —
        the caller pads them to a shape bucket so the resize/featurize
        programs compile once per bucket instead of once per queried
        count; rows past ``valid`` are dropped here, after the device
        work, before anything reaches the training set."""
        cfg = self.config
        q = len(pseudo) if valid is None else valid
        parts_l = [self.state.buffer_left]
        parts_r = [self.state.buffer_right]
        parts_y = [self.state.buffer_y]

        pseudo = np.asarray(pseudo)
        pad = len(left_raw) - len(pseudo)
        pseudo_b = (np.concatenate([pseudo, np.zeros(pad, pseudo.dtype)])
                    if pad else pseudo)
        if cfg.augment:
            # Augment the raw queried pairs, then map into student space
            # (ALINK.py:241-245 augments pixels and re-featurizes).
            al, ar, ay = augment_pairs(
                self._next_key(),
                jnp.asarray(left_raw),
                jnp.asarray(right_raw),
                jax.nn.one_hot(jnp.asarray(pseudo_b), 2),
            )
            ali, ari = self._student_inputs(
                resize(al, self.student_res), resize(ar, self.student_res)
            )
            # augment_pairs emits variant BLOCKS of len(left_raw) rows
            # each ([original, rotation, shear, shift]); keep the q real
            # rows of EVERY block — a plain [:q] would keep only the
            # clean originals and silently discard all augmented copies
            # (while [:4q] would train on mislabeled padding rows).
            bq = len(left_raw)
            n_blocks = int(ali.shape[0]) // bq
            rows = (np.arange(n_blocks)[:, None] * bq
                    + np.arange(q)[None, :]).reshape(-1)
            parts_l.append(np.asarray(ali)[rows])
            parts_r.append(np.asarray(ari)[rows])
            parts_y.append(np.argmax(np.asarray(ay)[rows], axis=-1))
        else:
            # Clean (un-noised) versions of the queried pairs
            # (ALINK.py:247-250), mapped into student space here.
            sfl, sfr = self._student_inputs(
                resize(jnp.asarray(left_raw), self.student_res),
                resize(jnp.asarray(right_raw), self.student_res),
            )
            parts_l.append(np.asarray(sfl)[:q])
            parts_r.append(np.asarray(sfr)[:q])
            parts_y.append(pseudo[:q])

        if self.replay_gen is not None:
            for _ in range(cfg.mixture_ratio):
                (rl, rr), ry = next(self.replay_gen)
                self.state.replay_draws += 1
                self._replay_consumed += 1
                parts_l.append(np.asarray(rl))
                parts_r.append(np.asarray(rr))
                parts_y.append(np.asarray(ry).reshape(-1))

        big_l = np.concatenate(parts_l)
        big_r = np.concatenate(parts_r)
        big_y = np.concatenate(parts_y)
        self.state.m2_state, _ = T.fit(
            self.state.m2_state,
            jnp.asarray(big_l),
            jnp.asarray(big_r),
            jnp.asarray(big_y, jnp.int32),
            epochs=cfg.ft_epochs,
            batch_size=16,  # ALINK.py:251 hard-codes bs 16 for finetune
            key=self._next_key(),
        )
        if self._nan_guard:
            # A diverged finetune silently poisons every later round —
            # fail at the step that produced it.
            check_finite(self.state.m2_state.params,
                         "finetuned M2 params", force=True)
        self.state.flush_buffer()

    # -- checkpoint / resume (greenfield; SURVEY.md section 5.4) ----------

    def save(self, path: str) -> None:
        """Checkpoint the full loop state: M2 params + optimizer, oracle
        accounting, pool cursor and the pending training queue.  The
        reference loses all of this on interruption (ALINK.py:135-143 keeps
        it in process-local variables).

        Layout: ``<path>/m2`` (structured: params + opt state, restored
        against the live TrainState so optimizer containers round-trip) and
        ``<path>/loop`` (raw arrays: counters + queue).
        """
        import os

        from alink_tpu.train.checkpoint import save as ckpt_save

        s = self.state
        ckpt_save(os.path.join(path, "m2"),
                  {"params": s.m2_state.params,
                   "opt_state": s.m2_state.opt_state})
        loop_tree = {
            "counters": np.array([s.active_count, s.un_size, s.pool_cursor,
                                  s.replay_draws,
                                  self._iteration_offset + len(self.logs)],
                                 np.int64),
            # RNG state: restoring it makes a resumed run reproduce the
            # uninterrupted trajectory exactly (noise draws, augmentation,
            # dropout keys all derive from self.key).
            "key": np.asarray(self.key),
        }
        if s.buffer_size():
            loop_tree["buffer_left"] = s.buffer_left
            loop_tree["buffer_right"] = s.buffer_right
            loop_tree["buffer_y"] = np.asarray(s.buffer_y, np.int32)
        ckpt_save(os.path.join(path, "loop"), loop_tree)

    def restore(self, path: str) -> bool:
        """Resume from a ``save`` checkpoint; returns False if absent."""
        import os

        from alink_tpu.train.checkpoint import maybe_restore

        s = self.state
        m2_tree, ok = maybe_restore(
            os.path.join(path, "m2"),
            {"params": s.m2_state.params, "opt_state": s.m2_state.opt_state},
        )
        loop_tree, ok2 = maybe_restore(os.path.join(path, "loop"))
        if not (ok and ok2):
            return False
        # Strip device placement: a checkpoint written while training under
        # an N-device mesh records that sharding, but an elastic restart
        # may resume with fewer surviving devices — host arrays re-place
        # lazily under whatever mesh the resumed jits run in.
        m2_tree = jax.tree.map(np.asarray, m2_tree)
        s.m2_state = s.m2_state.replace(params=m2_tree["params"],
                                        opt_state=m2_tree["opt_state"])
        counters = np.asarray(loop_tree["counters"])
        s.active_count = int(counters[0])
        s.un_size = int(counters[1])
        s.pool_cursor = int(counters[2])
        if "key" in loop_tree:
            self.key = jnp.asarray(loop_tree["key"])
        if counters.shape[0] > 3:
            # Restore the counter UNCONDITIONALLY: a resume without a
            # generator wired must not zero it (the next save() would
            # persist 0 and a later properly-configured resume would
            # fast-forward past nothing — silent trajectory divergence).
            s.replay_draws = int(counters[3])
        if counters.shape[0] > 4:
            # Resumed IterationLog indices continue the interrupted
            # run's metrics stream: the next iteration logged is exactly
            # the checkpoint's completed count, even if this loop object
            # already has in-process logs from a divergent path (older
            # checkpoints lack the field and keep restart-at-0).
            self._iteration_offset = int(counters[4]) - len(self.logs)
        if counters.shape[0] > 3 and self.replay_gen is not None:
            # Fast-forward a (deterministic) replay generator to the
            # position the interrupted run had consumed — without this a
            # resumed run fine-tunes on different replay batches and the
            # trajectory silently diverges from the uninterrupted one.
            # Only the DELTA from what this generator has already served
            # is skipped, so a second restore() (or restore() followed by
            # run(checkpoint_path=...)) is a no-op instead of a double
            # skip.
            while self._replay_consumed < s.replay_draws:
                next(self.replay_gen)
                self._replay_consumed += 1
        if "buffer_y" in loop_tree:
            s.buffer_left = np.asarray(loop_tree["buffer_left"])
            s.buffer_right = np.asarray(loop_tree["buffer_right"])
            s.buffer_y = np.asarray(loop_tree["buffer_y"])
        else:
            s.flush_buffer()
        return True

    # -- full run --------------------------------------------------------

    def run(
        self,
        plain_raw: PersonStacks,
        dig_post: PersonStacks,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 1,
        heartbeat=None,
        heartbeat_timeout_s: float = 600.0,
    ) -> ALinkState:
        """The framework loop over the unlabeled pool (ALINK.py:145-259).

        Failure recovery (SURVEY.md section 5.3 — the reference loses ALL
        selection state on interruption, ALINK.py:135-143): pass
        ``checkpoint_path`` to resume automatically from the last saved
        iteration and checkpoint every ``checkpoint_every`` iterations.
        The checkpoint includes the RNG key, so a resumed run reproduces
        the uninterrupted trajectory exactly.

        ``heartbeat`` (a ``utils.resilience.Heartbeat``) makes multi-host
        runs fail fast: each iteration beats this process's beacon and
        raises ``PeerFailure`` if a peer has missed
        ``heartbeat_timeout_s`` — surfacing a dead host to the
        supervisor instead of blocking forever in the next collective.
        """
        cfg = self.config
        if checkpoint_path:
            # pool_cursor, counters, buffers, RNG key and replay position
            # come back; the while-loop continues from the saved slab.
            resumed = self.restore(checkpoint_path)
            print(f"[alink] {'resumed from' if resumed else 'no checkpoint at'}"
                  f" {checkpoint_path}")
        p = dig_post.num_people
        iters = 0
        # The stop condition is evaluated BEFORE each iteration: a resumed
        # run whose restored state already satisfies it must not run (and
        # charge the oracle for) an extra slab.
        while self.state.pool_cursor < p and not (
                self.state.un_size > 0
                and int(cfg.active_ratio * self.state.un_size)
                <= self.state.active_count):  # ALINK.py:257-259
            ii = self.state.pool_cursor
            sl = list(range(ii, min(ii + cfg.alink_bs, p)))
            if heartbeat is not None:
                heartbeat.beat()
                heartbeat.ensure_peers_alive(heartbeat_timeout_s)
            self.run_iteration(plain_raw.take_people(sl),
                               dig_post.take_people(sl))
            self.state.pool_cursor = ii + cfg.alink_bs
            iters += 1
            if checkpoint_path and iters % max(1, checkpoint_every) == 0:
                self.save(checkpoint_path)
        if checkpoint_path:
            self.save(checkpoint_path)
        return self.state
