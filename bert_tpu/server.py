"""Embedding server: reference-wire-compatible TCP front-end with a
continuous-batching scheduler.

Wire protocol (kept byte-compatible with the reference server,
examples/server.cpp:26-34,107: clients like examples/sample_client.py work
unchanged):
  * on connect, server sends ``n_embd`` as a raw little-endian int32;
  * client sends one UTF-8 text per message (single read, ≤ 32 KiB, no
    length framing — a documented reference quirk);
  * server replies with ``n_embd`` raw little-endian float32s.

Where the reference accepts ONE client at a time and evaluates one
sentence per graph build (server.cpp:92 listen backlog 1; SURVEY.md §3.4),
this server is asyncio-concurrent: every connection feeds a shared queue,
and a micro-batching scheduler drains it into padded bucket batches on
the TPU. The default window policy is **adaptive** (work-conserving
continuous batching): a request dispatches immediately when a device slot
is free, and while all slots are busy — when waiting costs nothing — the
forming batch absorbs every queued arrival (up to ``max_batch``), so
batch size tracks the arrival rate during one device step. Pass a numeric
``batch_window_ms`` for the classic fixed collection window. Under load,
batch size grows automatically and throughput approaches the offline
bucketed rate.
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import struct
import time
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

logger = logging.getLogger(__name__)

MAX_MSG = 1 << 15  # reference read buffer size (server.cpp:27)

# Optional framed messages (used by csrc/bert_client.cpp to back the C API
# with exact pre-tokenized inputs). Every magic starts with 0xB5 — an
# invalid UTF-8 lead-in position — so no real text message can collide with
# one and plain-text clients stay byte-compatible. All integers are
# little-endian.
#
#   EVAL   magic, i32 n_tokens, n_tokens × i32 ids
#          → n_embd raw f32 (same reply shape as a text message)
#   BATCH  magic, i32 n_sentences, then per sentence i32 n_tokens + ids
#          → n_sentences × n_embd raw f32, in request order. ONE round
#            trip for the whole batch (the C API's bert_eval_batch /
#            bert_encode_batch — the reference's primary benchmark surface,
#            /root/reference/benchmarks/run_mteb.py:70 — was previously
#            latency-bound at one round trip per sentence).
#   META   magic only → magic echo, i32 version, i32 n_embd,
#          i32 n_max_tokens (16 bytes; lets "host:port" clients learn the
#          real token cap instead of assuming 512)
#   STATS  magic only → magic echo, u64 n_served, u64 n_batches (20 bytes)
#   STATS2 magic only → magic echo, u64 n_served, u64 n_batches,
#          u32 latency sample count, u32 p50, u32 p95, u32 p99 (µs,
#          request submit→result over a sliding reservoir; 36 bytes).
#          Separate magic so STATS stays 20 bytes for old consumers.
BIN_EVAL_MAGIC = b"\xb5\x87\xe3\x01"
BIN_BATCH_MAGIC = b"\xb5\x87\xe3\x02"
BIN_META_MAGIC = b"\xb5\x87\xe3\x03"
BIN_STATS_MAGIC = b"\xb5\x87\xe3\x04"
BIN_STATS2_MAGIC = b"\xb5\x87\xe3\x05"
PROTOCOL_VERSION = 1
MAX_BATCH_SENTENCES = 16384  # caps a framed batch reply at ~25 MB (D=384)


class BatchingScheduler:
    """Collects (text, future) requests and evaluates them in micro-batches."""

    def __init__(self, model, *, max_batch: int = 64,
                 batch_window_ms: Union[float, str] = "adaptive",
                 pipeline_depth: int = 1,
                 queue_depth: Optional[int] = None):
        self.model = model
        self.max_batch = max_batch
        # "adaptive" (the default) = cost-aware continuous batching:
        # while every device slot is busy, waiting costs nothing, so the
        # forming batch absorbs queued arrivals for free and batch size
        # tracks the arrival rate during one device step. The decisive
        # moment is when a slot FREES with the batch still under-full:
        # the batch that just finished set its clients' futures
        # microseconds ago, and closed-loop clients resubmit within ~a ms
        # — a completion wave that is in flight but not yet queued.
        # Dispatching instantly there fragments the wave (a scheduler
        # trace on the tunneled v5e showed a self-sustaining 1+3 split:
        # every top-up fired ~1 ms before the wave landed, halving
        # low-load throughput and doubling p50). So when a step time has
        # been measured AND arrivals have shown real concurrency (a lone
        # client never waits — see _concurrency note in _run), the
        # dispatcher holds the idle slot for ≤ patience (a fraction of
        # one step, capped) and exits on arrival quiescence: one short
        # empty gap after the wave is aboard. On a fast device the
        # patience is microseconds — immediate dispatch in effect; no
        # per-deployment tuning. An explicit numeric batch_window_ms
        # keeps the classic fixed-window behavior.
        self.adaptive = batch_window_ms == "adaptive"
        self.batch_window = (0.0 if self.adaptive
                             else float(batch_window_ms) / 1000.0)
        self._step_ema: Optional[float] = None  # EMA of batch eval seconds
        # EMA of the concurrency indicator: 1.0 when a batch carried ≥2
        # requests or its first request arrived while a slot was busy
        # (impossible for a lone closed-loop client, whose previous
        # request always completes before its next exists). Starts at 0
        # so the first requests ever seen are never held.
        self._conc_ema: float = 0.0
        self.patience_frac = 0.25   # of one step; class-attr tunables
        self.patience_cap = 0.020   # seconds
        # straggler-gap ceiling: one empty gap ends the wave hold. 2 ms
        # covers a loopback/LAN client turnaround; raise it for clients
        # that resubmit over slower links
        self.gap_cap = 0.002
        self._evals_inflight = 0    # busy device slots (for the indicator)
        self._first_while_busy = False
        # bounded queue = backpressure: when ~128 micro-batches of work are
        # already pending, submit() suspends its connection handler instead
        # of buffering unboundedly (a flood of framed BATCH messages would
        # otherwise grow host memory without limit); the TCP receive window
        # then pushes back on the client
        # `is None` (not falsiness): an explicit queue_depth=0 keeps
        # asyncio's conventional meaning — an unbounded queue (ADVICE r3)
        self.queue_depth = (queue_depth if queue_depth is not None
                            else max_batch * 128)
        # micro-batches allowed in flight concurrently. >1 lets batch
        # N+1's tokenize/pack/dispatch overlap batch N's device compute —
        # useful on compute-bound production hosts; measured NEUTRAL-to-
        # NEGATIVE on tunnel-attached dev boxes (concurrent result
        # transfers contend on the link), hence default 1.
        self.pipeline_depth = max(1, pipeline_depth)
        self.queue: asyncio.Queue = asyncio.Queue(maxsize=self.queue_depth)
        self._task: Optional[asyncio.Task] = None
        # strong refs to in-flight eval tasks: the event loop only keeps
        # weak references, so an unreferenced task can be GC'd mid-flight
        # (hanging its clients and leaking the semaphore slot)
        self._inflight: set = set()
        self.n_served = 0
        self.n_batches = 0
        # sliding reservoir of request latencies (submit -> result, s);
        # deque maxlen bounds memory and biases toward recent behavior
        from collections import deque

        self.latencies: deque = deque(maxlen=4096)
        # per-batch scheduler trace (BERT_TPU_SCHED_TRACE=path.jsonl): one
        # JSON line per dispatched batch with the collect/slot/eval
        # timeline — the measurement tool behind the adaptive-window
        # accounting in docs/PERF.md
        import os as _os

        trace_path = _os.environ.get("BERT_TPU_SCHED_TRACE")
        self._trace = open(trace_path, "a") if trace_path else None
        self._last_collect: dict = {}

    async def submit(self, text: str) -> np.ndarray:
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        fut._t_submit = time.monotonic()
        await self.queue.put((text, fut))
        return await fut

    async def submit_tokens(self, token_ids: Sequence[int]) -> np.ndarray:
        """Pre-tokenized request (framed binary message / C API bert_eval)."""
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        fut._t_submit = time.monotonic()
        await self.queue.put((list(token_ids), fut))
        return await fut

    def latency_percentiles_us(self):
        """(n, p50, p95, p99) in µs over the reservoir (zeros when empty)."""
        if not self.latencies:
            return 0, 0, 0, 0
        import math

        ms = np.sort(np.asarray(self.latencies))
        # ceil rank: the tail percentile of a small reservoir must round UP
        # to the worse sample (flooring made p99-of-3 report the median).
        # Clamp to the wire's u32: a pathological multi-hour latency (seen
        # in tunnel degradation windows) must saturate, not explode the
        # struct.pack in the STATS2 handler.
        pick = lambda q: min(0xFFFFFFFF,
                             int(ms[min(len(ms) - 1,
                                        math.ceil(q * (len(ms) - 1)))] * 1e6))
        return len(ms), pick(0.50), pick(0.95), pick(0.99)

    async def submit_many(self, payloads: Sequence[Union[str, List[int]]]
                          ) -> List[np.ndarray]:
        """Enqueue a whole framed batch at once; results in request order.
        The collector drains a non-empty queue without waiting out the
        batch window, so an explicit batch fills micro-batches back to
        back instead of trickling."""
        loop = asyncio.get_running_loop()
        futs = [loop.create_future() for _ in payloads]
        t0 = time.monotonic()
        for p, f in zip(payloads, futs):
            f._t_submit = t0
            await self.queue.put((p, f))
        # return_exceptions so every sibling future is retrieved even when
        # one micro-batch fails (otherwise each unretrieved exception logs
        # a 'Future exception was never retrieved' warning); re-raise the
        # first failure for the caller.
        results = await asyncio.gather(*futs, return_exceptions=True)
        for r in results:
            if isinstance(r, BaseException):
                raise r
        return list(results)

    def start(self) -> None:
        self._task = asyncio.get_running_loop().create_task(self._run())

    async def stop(self) -> None:
        for task in (self._task, *tuple(self._inflight)):
            if task is None:
                continue
            task.cancel()
            try:
                await task
            except asyncio.CancelledError:
                pass
        # fail queued-but-never-collected requests too: the collector is
        # dead, so their futures would otherwise strand any client blocked
        # in submit()/submit_many() forever (review r4 — in-flight batches
        # already get ConnectionError above, queued ones got nothing)
        while True:
            try:
                _, fut = self.queue.get_nowait()
            except asyncio.QueueEmpty:
                break
            if not fut.done():
                fut.set_exception(ConnectionError("server shutting down"))
        if self._trace is not None:
            self._trace.close()
            self._trace = None

    async def _collect(self, batch: List[Tuple[str, asyncio.Future]]
                       ) -> List[Tuple[str, asyncio.Future]]:
        """Collect the next micro-batch by APPENDING into ``batch`` (owned
        by _run): on cancellation mid-collect, _run can still see — and
        fail — requests already dequeued but never dispatched."""
        first = await self.queue.get()
        batch.append(first)
        # concurrency evidence: a lone closed-loop client's next request
        # cannot exist while its previous one is still evaluating
        self._first_while_busy = self._evals_inflight > 0
        if self._trace is not None:
            self._last_collect = {"t_first": time.monotonic()}
        if self.adaptive:
            # take whatever is already queued and return immediately: the
            # wait on the device slot (in _run) batches further arrivals
            # for free, and the completion-wave hold happens THERE — at
            # the slot-free moment, the only place holding buys anything
            while len(batch) < self.max_batch:
                try:
                    batch.append(self.queue.get_nowait())
                except asyncio.QueueEmpty:
                    break
            return batch
        deadline = time.monotonic() + self.batch_window
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = await asyncio.wait_for(self.queue.get(), timeout)
                batch.append(item)
            except asyncio.TimeoutError:
                break
        return batch

    def _adaptive_patience(self) -> float:
        """How long the dispatcher may hold an under-full batch on an
        idle slot, waiting for the completion wave.

        Zero until a step time has been measured, and zero while the
        concurrency EMA says requests arrive alone (a lone client must
        never wait). Otherwise a fraction of one measured step, capped:
        on the tunnel (~35 ms steps) that's ~9 ms — enough for the ~1 ms
        client turnaround plus the quiescence gap; on a fast host it's
        microseconds — immediate dispatch in effect."""
        if self._step_ema is None or self._conc_ema < 0.25:
            return 0.0
        return min(self.patience_frac * self._step_ema, self.patience_cap)

    def _eval_mixed(self, payloads: List[Union[str, List[int]]]) -> np.ndarray:
        """Evaluate a batch that may mix raw texts and pre-tokenized ids."""
        toks: List[List[int]] = list(payloads)  # type: ignore[arg-type]
        text_idx = [i for i, p in enumerate(payloads) if isinstance(p, str)]
        if text_idx:
            tokenized = self.model.tokenizer.tokenize_batch(
                [payloads[i] for i in text_idx], self.model.n_max_tokens
            )
            for i, t in zip(text_idx, tokenized):
                toks[i] = t
        return self.model.eval_tokens(toks)

    async def _eval_one_batch(self, batch, sem: asyncio.Semaphore,
                              trace: Optional[dict] = None) -> None:
        loop = asyncio.get_running_loop()
        payloads = [t for t, _ in batch]
        t_start = time.monotonic()
        try:
            # evaluation blocks on device results → thread executor,
            # so the event loop keeps accepting/collecting meanwhile
            embs = await loop.run_in_executor(
                None, self._eval_mixed, payloads
            )
            t_done = time.monotonic()
            step = t_done - t_start
            self._step_ema = (step if self._step_ema is None
                              else 0.25 * step + 0.75 * self._step_ema)
            for (_, fut), emb in zip(batch, embs):
                if not fut.done():
                    fut.set_result(emb)
                    t0 = getattr(fut, "_t_submit", None)
                    if t0 is not None:
                        self.latencies.append(t_done - t0)
            # count ONLY successful batches: a failed eval served nobody,
            # and STATS reporting it as throughput would make monitoring
            # read healthy during an outage (review r4)
            self.n_served += len(batch)
            self.n_batches += 1
            if self._trace is not None and trace is not None:
                import json as _json

                trace.update({"t_eval0": t_start, "t_eval1": t_done,
                              "n": len(batch)})
                self._trace.write(_json.dumps(trace) + "\n")
                self._trace.flush()
        except asyncio.CancelledError:
            # server shutdown mid-eval: fail the batch's clients instead of
            # stranding their futures forever
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(ConnectionError("server shutting down"))
            raise
        except Exception as exc:  # pragma: no cover - defensive
            logger.exception("batch evaluation failed")
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(exc)
        finally:
            self._evals_inflight -= 1
            sem.release()

    async def _run(self) -> None:
        loop = asyncio.get_running_loop()
        sem = asyncio.Semaphore(self.pipeline_depth)
        batch: List[Tuple[str, asyncio.Future]] = []
        try:
            while True:
                batch = []
                await self._collect(batch)
                if self._trace is not None:
                    self._last_collect["t_collect"] = time.monotonic()
                    self._last_collect["n_collect"] = len(batch)
                await sem.acquire()
                if self._trace is not None:
                    self._last_collect["t_slot"] = time.monotonic()
                if self.adaptive:
                    # everything that queued while this batch waited for
                    # the device slot rides along — batching that cost
                    # zero added latency (the wait was forced either way)
                    while len(batch) < self.max_batch:
                        try:
                            batch.append(self.queue.get_nowait())
                        except asyncio.QueueEmpty:
                            break
                    # completion-wave hold (see __init__): the slot is
                    # free, but the batch that freed it unblocked its
                    # clients only microseconds ago — their resubmits are
                    # in flight, not yet queued. Give the wave ≤ patience
                    # to land, then exit one short empty gap after
                    # arrivals quiesce (the wave is aboard).
                    # NOTE the hold can never start before the wave's
                    # first arrival: _run only reaches this point after
                    # _collect's blocking get() returned. So every wait
                    # here is a short straggler gap — one empty gap means
                    # the wave is aboard — and patience bounds the total.
                    patience = self._adaptive_patience()
                    if patience > 0 and len(batch) < self.max_batch:
                        deadline = time.monotonic() + patience
                        gap = min(0.25 * patience, self.gap_cap)
                        while len(batch) < self.max_batch:
                            timeout = min(gap,
                                          deadline - time.monotonic())
                            if timeout <= 0:
                                break
                            try:
                                batch.append(await asyncio.wait_for(
                                    self.queue.get(), timeout))
                            except asyncio.TimeoutError:
                                break
                    conc = 1.0 if (len(batch) >= 2
                                   or self._first_while_busy) else 0.0
                    self._conc_ema = 0.25 * conc + 0.75 * self._conc_ema
                self._evals_inflight += 1
                task = loop.create_task(
                    self._eval_one_batch(batch, sem,
                                         trace=self._last_collect or None))
                self._last_collect = {}
                self._inflight.add(task)
                task.add_done_callback(self._inflight.discard)
        except asyncio.CancelledError:
            # shutdown can land while a collected-but-undispatched batch
            # waits on the device slot (or mid-collect): those futures
            # were already dequeued, so stop()'s queue drain would never
            # see them — fail them here or their clients hang forever
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(
                        ConnectionError("server shutting down"))
            raise


class EmbeddingServer:
    def __init__(self, model, host: str = "0.0.0.0", port: int = 8085,
                 *, max_batch: int = 64,
                 batch_window_ms: Union[float, str] = "adaptive",
                 pipeline_depth: int = 1, queue_depth: Optional[int] = None):
        self.model = model
        self.host = host
        self.port = port
        self.scheduler = BatchingScheduler(
            model, max_batch=max_batch, batch_window_ms=batch_window_ms,
            pipeline_depth=pipeline_depth, queue_depth=queue_depth,
        )
        self._server: Optional[asyncio.AbstractServer] = None

    @staticmethod
    async def _fill(reader: asyncio.StreamReader, buf: bytearray,
                    need: int) -> bool:
        """Grow ``buf`` to at least ``need`` bytes; False on EOF."""
        while len(buf) < need:
            more = await reader.read(need - len(buf))
            if not more:
                return False
            buf.extend(more)
        return True

    def _peek_n_tokens(self, buf: bytearray, off: int) -> int:
        """Read + validate the i32 token count at ``off`` (the ONE range
        rule for every framed token record); raises ValueError."""
        (n_tok,) = struct.unpack_from("<i", buf, off)
        if not 0 <= n_tok <= self.model.n_max_tokens:
            raise ValueError(f"framed eval n_tokens={n_tok} out of range "
                             f"(max {self.model.n_max_tokens})")
        return n_tok

    def _read_token_list(self, buf: bytearray, off: int):
        """Parse one (i32 n_tokens, ids) record at ``off``; returns
        (ids, new_off) or raises ValueError on an invalid count or an
        out-of-vocab id. The caller guarantees the bytes are present."""
        n_tok = self._peek_n_tokens(buf, off)
        ids = np.frombuffer(bytes(buf[off + 4: off + 4 + 4 * n_tok]),
                            dtype="<i4")
        if n_tok and (ids.min() < 0 or ids.max() >= self.model.n_vocab):
            # XLA's gather clamps out-of-range indices — without this
            # check a bogus id would SILENTLY embed the clamped vocab row
            # (garbage in a retrieval index) instead of failing the frame
            raise ValueError(
                f"framed eval token id out of range [0, "
                f"{self.model.n_vocab}): "
                f"{int(ids.min())}..{int(ids.max())}")
        return ids.tolist(), off + 4 + 4 * n_tok

    async def _handle_framed(self, magic: bytes,
                             reader: asyncio.StreamReader,
                             writer: asyncio.StreamWriter,
                             buf: bytearray) -> bool:
        """Process one framed message starting at buf[0]; consumes exactly
        its bytes (pipelined messages stay in ``buf`` for the next loop
        turn). Returns False when the connection must close (malformed
        frame: the stream cannot be resynchronized)."""
        if magic == BIN_META_MAGIC:
            del buf[:4]
            writer.write(BIN_META_MAGIC + struct.pack(
                "<iii", PROTOCOL_VERSION, self.model.n_embd,
                self.model.n_max_tokens))
            await writer.drain()
            return True
        if magic == BIN_STATS_MAGIC:
            del buf[:4]
            writer.write(BIN_STATS_MAGIC + struct.pack(
                "<QQ", self.scheduler.n_served, self.scheduler.n_batches))
            await writer.drain()
            return True
        if magic == BIN_STATS2_MAGIC:
            del buf[:4]
            n, p50, p95, p99 = self.scheduler.latency_percentiles_us()
            writer.write(BIN_STATS2_MAGIC + struct.pack(
                "<QQIIII", self.scheduler.n_served,
                self.scheduler.n_batches, n, p50, p95, p99))
            await writer.drain()
            return True
        if magic == BIN_EVAL_MAGIC:
            if not await self._fill(reader, buf, 8):
                return False
            try:
                n_tok = self._peek_n_tokens(buf, 4)
            except ValueError as exc:
                logger.warning("rejecting framed eval: %s", exc)
                return False
            need = 8 + 4 * n_tok
            if not await self._fill(reader, buf, need):
                return False
            try:
                # out-of-vocab ids must take the same one-line rejection
                # path as the BATCH frame, not the generic handler
                # traceback (review r4)
                ids, _ = self._read_token_list(buf, 4)
            except ValueError as exc:
                logger.warning("rejecting framed eval: %s", exc)
                return False
            del buf[:need]
            emb = await self.scheduler.submit_tokens(ids)
            writer.write(np.asarray(emb, dtype="<f4").tobytes())
            await writer.drain()
            return True
        if magic == BIN_BATCH_MAGIC:
            if not await self._fill(reader, buf, 8):
                return False
            (n_sent,) = struct.unpack_from("<i", buf, 4)
            if not 1 <= n_sent <= MAX_BATCH_SENTENCES:
                logger.warning("rejecting framed batch with n_sentences=%d "
                               "(max %d)", n_sent, MAX_BATCH_SENTENCES)
                return False
            off = 8
            batches: List[List[int]] = []
            try:
                for _ in range(n_sent):
                    if not await self._fill(reader, buf, off + 4):
                        return False
                    n_tok = self._peek_n_tokens(buf, off)
                    if not await self._fill(reader, buf, off + 4 + 4 * n_tok):
                        return False
                    ids, off = self._read_token_list(buf, off)
                    batches.append(ids)
            except ValueError as exc:
                logger.warning("rejecting framed batch: %s", exc)
                return False
            del buf[:off]
            embs = await self.scheduler.submit_many(batches)
            writer.write(np.concatenate(
                [np.asarray(e, dtype="<f4") for e in embs]).tobytes())
            await writer.drain()
            return True
        return False  # unreachable: caller checked the magic

    _FRAMED_MAGICS = (BIN_EVAL_MAGIC, BIN_BATCH_MAGIC, BIN_META_MAGIC,
                      BIN_STATS_MAGIC, BIN_STATS2_MAGIC)

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter) -> None:
        peer = writer.get_extra_info("peername")
        logger.info("client connected: %s", peer)
        # handshake: n_embd as int32 (server.cpp:107)
        writer.write(struct.pack("<i", self.model.n_embd))
        await writer.drain()
        buf = bytearray()
        try:
            while True:
                if not buf:
                    data = await reader.read(MAX_MSG)
                    if not data:
                        break
                    buf.extend(data)
                # A leading 0xB5 byte is a framed-message magic (not a valid
                # UTF-8 lead byte), so finish reading the 4-byte magic if it
                # straddled the first TCP segment — but only wait briefly:
                # a short non-UTF-8 text message starting 0xB5 from a legacy
                # client must still get a (replacement-char) reply rather
                # than deadlock the connection.
                if buf[0] == 0xB5 and len(buf) < 4:
                    try:
                        if not await asyncio.wait_for(
                                self._fill(reader, buf, 4), timeout=1.0):
                            return
                    except asyncio.TimeoutError:
                        pass
                if len(buf) >= 4 and bytes(buf[:4]) in self._FRAMED_MAGICS:
                    # leftover bytes beyond this frame stay buffered: a
                    # client may pipeline several framed messages in one
                    # TCP segment
                    if not await self._handle_framed(bytes(buf[:4]), reader,
                                                     writer, buf):
                        return
                    continue
                text = bytes(buf).decode("utf-8", errors="replace")
                buf.clear()
                emb = await self.scheduler.submit(text)
                writer.write(np.asarray(emb, dtype="<f4").tobytes())
                await writer.drain()
        except (ConnectionError, asyncio.IncompleteReadError):
            # ConnectionError covers reset, abort AND BrokenPipeError —
            # all three are routine client-vanished shapes, not failures
            # worth a traceback (review r4)
            pass
        except Exception:  # eval failure (device error, bad batch, ...)
            # close THIS connection with a log instead of leaking an
            # unhandled-task traceback; other clients are unaffected
            logger.exception("closing connection %s after failed request",
                             peer)
        finally:
            writer.close()
            logger.info("client disconnected: %s", peer)

    async def serve(self, ready_event: Optional[asyncio.Event] = None
                    ) -> None:
        self.scheduler.start()
        self._server = await asyncio.start_server(
            self._handle, self.host, self.port
        )
        addr = self._server.sockets[0].getsockname()
        logger.info("server running on %s:%s", *addr[:2])
        print(f"Server running on port {addr[1]}", flush=True)
        if ready_event is not None:
            ready_event.set()
        async with self._server:
            await self._server.serve_forever()

    async def close(self) -> None:
        await self.scheduler.stop()
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()


def main(argv=None) -> None:
    from .cli import add_common_args, load_model_from_args

    ap = argparse.ArgumentParser(
        "bert_tpu.server", description="TPU embedding server "
        "(reference-wire-compatible, continuous batching)")
    add_common_args(ap)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--max-batch", type=int, default=64,
                    help="micro-batch cap per TPU step")
    ap.add_argument("--batch-window-ms", default="adaptive",
                    type=lambda s: s if s == "adaptive" else float(s),
                    help="'adaptive' (default): dispatch immediately when "
                    "a device slot is free and absorb arrivals while it "
                    "is busy; or a fixed wait in ms before running")
    ap.add_argument("--pipeline-depth", type=int, default=1,
                    help="micro-batches allowed in flight concurrently "
                    "(>1 overlaps batches on compute-bound hosts)")
    ap.add_argument("--queue-depth", type=int, default=None,
                    help="pending-request backpressure bound (default "
                    "max_batch*128; 0 = unbounded)")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip pre-compiling bucket shapes at startup")
    ap.add_argument("--warmup-manifest", default=None, metavar="PATH",
                    help="warm only the shapes a previous run of this "
                    "config executed (written back on shutdown) instead "
                    "of the whole default grid")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    model = load_model_from_args(args, max_batch=args.max_batch)
    if not args.no_warmup:
        t0 = time.time()
        import os as _os

        if args.warmup_manifest and _os.path.exists(args.warmup_manifest):
            print(f"warming shapes from {args.warmup_manifest} ...",
                  flush=True)
            # serving grid doubles as the fallback if the manifest is
            # unusable (corrupt / wrong model / empty)
            model.warmup(batch_sizes=[1, 8, args.max_batch],
                         max_rows=args.max_batch,
                         manifest=args.warmup_manifest)
        else:
            print("warming up bucket shapes ...", flush=True)
            # rows never exceed the scheduler's per-batch sentence cap
            model.warmup(batch_sizes=[1, 8, args.max_batch],
                         max_rows=args.max_batch)
        print(f"warmup done in {time.time() - t0:.1f}s", flush=True)

    server = EmbeddingServer(model, host=args.host, port=args.port,
                             max_batch=args.max_batch,
                             batch_window_ms=args.batch_window_ms,
                             pipeline_depth=args.pipeline_depth,
                             queue_depth=args.queue_depth)
    # graceful SIGTERM (systemd/docker stop): without this the process
    # dies mid-eval and the warmup-manifest write-back never runs
    import signal

    def _sigterm(*_):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        asyncio.run(server.serve())
    except KeyboardInterrupt:
        pass
    finally:
        if args.warmup_manifest:
            # record the shapes this run actually executed so the next
            # start compiles exactly those (merged with any prior runs)
            try:
                model.save_warmup_manifest(args.warmup_manifest)
            except OSError as exc:  # unwritable path must not mask shutdown
                logging.getLogger("bert_tpu.server").warning(
                    "could not write warmup manifest %s: %r",
                    args.warmup_manifest, exc)


if __name__ == "__main__":
    main()
