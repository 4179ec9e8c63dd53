"""Server tests: reference wire protocol (handshake + raw f32 replies) and
micro-batching of concurrent clients — end-to-end over real sockets."""

import asyncio
import struct

import numpy as np
import pytest

from bert_tpu.engine import BertTPU
from bert_tpu.loader import LoadedModel
from bert_tpu.params import (
    BertConfig,
    params_from_named_tensors,
    random_named_tensors,
)
from bert_tpu.server import EmbeddingServer
from fixture_vocab import build_fixture_vocab

CFG = BertConfig(n_vocab=30522, n_max_tokens=64, n_embd=64,
                 n_intermediate=128, n_head=4, n_layer=2)


@pytest.fixture(scope="module")
def model():
    loaded = LoadedModel(
        config=CFG,
        params=params_from_named_tensors(random_named_tensors(CFG, 9), CFG),
        vocab=build_fixture_vocab(),
    )
    return BertTPU(loaded, max_batch=8)


async def _client_roundtrip(port, texts):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    (n_embd,) = struct.unpack("<i", await reader.readexactly(4))
    outs = []
    for text in texts:
        writer.write(text.encode("utf-8"))
        await writer.drain()
        raw = await reader.readexactly(n_embd * 4)
        outs.append(np.frombuffer(raw, dtype="<f4").copy())
    writer.close()
    await writer.wait_closed()
    return n_embd, outs


def _run_with_server(model, coro_fn, **server_kw):
    async def go():
        server = EmbeddingServer(model, host="127.0.0.1", port=0, **server_kw)
        ready = asyncio.Event()
        task = asyncio.get_running_loop().create_task(server.serve(ready))
        await ready.wait()
        port = server._server.sockets[0].getsockname()[1]
        try:
            return await coro_fn(server, port)
        finally:
            await server.close()
            task.cancel()
            try:
                await task
            except (asyncio.CancelledError, Exception):
                pass

    return asyncio.run(go())


def test_wire_protocol_single_client(model):
    async def scenario(server, port):
        return await _client_roundtrip(port, ["the store", "don't go"])

    n_embd, outs = _run_with_server(model, scenario)
    assert n_embd == CFG.n_embd
    assert len(outs) == 2
    for emb in outs:
        assert emb.shape == (CFG.n_embd,)
        np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-4)
    # server result equals direct engine result
    direct = model.encode("the store")
    np.testing.assert_allclose(outs[0], direct, atol=1e-5)


def test_concurrent_clients_are_batched(model):
    texts = [f"go to the store {i}" for i in range(12)]

    async def scenario(server, port):
        results = await asyncio.gather(
            *[_client_roundtrip(port, [t]) for t in texts]
        )
        return results, server.scheduler.n_batches, server.scheduler.n_served

    results, n_batches, n_served = _run_with_server(
        model, scenario, batch_window_ms=50.0, max_batch=16
    )
    assert n_served == 12
    # micro-batching must have coalesced concurrent requests
    assert n_batches < 12, f"no batching happened ({n_batches} batches)"
    ref = model.encode_batch(texts)
    for (n_embd, outs), expected in zip(results, ref):
        np.testing.assert_allclose(outs[0], expected, atol=1e-5)


def test_multiple_sequential_clients(model):
    """Reference server serves one client at a time (server.cpp:100); ours
    must handle reconnects too."""
    async def scenario(server, port):
        a = await _client_roundtrip(port, ["first client"])
        b = await _client_roundtrip(port, ["second client"])
        return a, b

    (na, outs_a), (nb, outs_b) = _run_with_server(model, scenario)
    assert na == nb == CFG.n_embd
    assert outs_a and outs_b


def test_framed_eval_and_magic_straddle(model):
    """Framed token-eval messages work even when the magic bytes straddle
    TCP segments, and oversized n_tokens is rejected by closing."""
    from bert_tpu.server import BIN_EVAL_MAGIC

    ids = model.tokenize("the store")

    async def scenario(server, port):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        (n_embd,) = struct.unpack("<i", await reader.readexactly(4))
        # text baseline
        writer.write(b"the store")
        await writer.drain()
        ref = np.frombuffer(await reader.readexactly(n_embd * 4), "<f4").copy()
        # framed eval, magic split across two writes
        msg = (BIN_EVAL_MAGIC + struct.pack("<i", len(ids))
               + np.asarray(ids, "<i4").tobytes())
        writer.write(msg[:2])
        await writer.drain()
        await asyncio.sleep(0.05)
        writer.write(msg[2:])
        await writer.drain()
        out = np.frombuffer(await reader.readexactly(n_embd * 4), "<f4").copy()
        writer.close()
        await writer.wait_closed()

        # oversized n_tokens → server closes the connection
        reader2, writer2 = await asyncio.open_connection("127.0.0.1", port)
        await reader2.readexactly(4)
        writer2.write(BIN_EVAL_MAGIC + struct.pack("<i", 1 << 30))
        await writer2.drain()
        got = await reader2.read(16)
        writer2.close()
        await writer2.wait_closed()
        return ref, out, got

    ref, out, got = _run_with_server(model, scenario)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert got == b"", "oversized framed eval must close the connection"


def test_framed_batch_single_round_trip(model):
    """One BATCH frame carrying N token lists → one reply with N vectors,
    matching the per-message framed path bit-for-bit."""
    from bert_tpu.server import BIN_BATCH_MAGIC

    texts = ["the store", "don't go", "going to", "store don't go anywhere"]
    token_lists = [model.tokenize(t) for t in texts]

    async def scenario(server, port):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        (n_embd,) = struct.unpack("<i", await reader.readexactly(4))
        msg = BIN_BATCH_MAGIC + struct.pack("<i", len(token_lists))
        for ids in token_lists:
            msg += struct.pack("<i", len(ids)) + \
                np.asarray(ids, "<i4").tobytes()
        writer.write(msg)
        await writer.drain()
        raw = await reader.readexactly(n_embd * 4 * len(token_lists))
        writer.close()
        await writer.wait_closed()
        return np.frombuffer(raw, "<f4").reshape(len(token_lists), n_embd)

    out = _run_with_server(model, scenario)
    ref = model.encode_batch(texts)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_framed_zero_token_record(model):
    """A framed record with n_tokens=0 is VALID (the C API clamps negative
    counts to 0, csrc/bert_client.cpp clamp_tokens) and must embed as a
    deterministic zero vector via the packed path's empty-segment fallback —
    without failing the batch or its sibling records. Pins the behavior
    ADVICE r2 flagged as regressable."""
    from bert_tpu.server import BIN_BATCH_MAGIC

    real = model.tokenize("the store")

    async def scenario(server, port):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        (n_embd,) = struct.unpack("<i", await reader.readexactly(4))
        msg = BIN_BATCH_MAGIC + struct.pack("<i", 3)
        msg += struct.pack("<i", 0)  # empty record
        msg += struct.pack("<i", len(real)) + np.asarray(real, "<i4").tobytes()
        msg += struct.pack("<i", 0)  # empty record
        writer.write(msg)
        await writer.drain()
        raw = await reader.readexactly(n_embd * 4 * 3)
        writer.close()
        await writer.wait_closed()
        return np.frombuffer(raw, "<f4").reshape(3, n_embd)

    out = _run_with_server(model, scenario)
    assert np.allclose(out[0], 0.0) and np.allclose(out[2], 0.0)
    np.testing.assert_allclose(out[1], model.encode("the store"), atol=1e-5)


def test_framed_meta_and_stats(model):
    from bert_tpu.server import (
        BIN_META_MAGIC,
        BIN_STATS_MAGIC,
        PROTOCOL_VERSION,
    )

    async def scenario(server, port):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        await reader.readexactly(4)
        writer.write(BIN_META_MAGIC)
        await writer.drain()
        meta_raw = await reader.readexactly(16)
        # do some work so the counters move
        writer.write(b"the store")
        await writer.drain()
        await reader.readexactly(CFG.n_embd * 4)
        writer.write(BIN_STATS_MAGIC)
        await writer.drain()
        stats_raw = await reader.readexactly(20)
        writer.close()
        await writer.wait_closed()
        return meta_raw, stats_raw

    meta_raw, stats_raw = _run_with_server(model, scenario)
    from bert_tpu.server import BIN_META_MAGIC, BIN_STATS_MAGIC

    assert meta_raw[:4] == BIN_META_MAGIC
    version, n_embd, n_max = struct.unpack("<iii", meta_raw[4:])
    assert (version, n_embd, n_max) == (PROTOCOL_VERSION, CFG.n_embd,
                                        CFG.n_max_tokens)
    assert stats_raw[:4] == BIN_STATS_MAGIC
    n_served, n_batches = struct.unpack("<QQ", stats_raw[4:])
    assert n_served >= 1 and n_batches >= 1


def test_framed_stats2_latency(model):
    """STATS2: served/batch counters plus submit→result latency
    percentiles in µs over the scheduler's reservoir (the serving-side
    half of the tail-latency evidence; soak.py consumes it)."""
    from bert_tpu.server import BIN_STATS2_MAGIC

    async def scenario(server, port):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        await reader.readexactly(4)
        for text in ("the store", "don't go", "going to"):
            writer.write(text.encode())
            await writer.drain()
            await reader.readexactly(CFG.n_embd * 4)
        writer.write(BIN_STATS2_MAGIC)
        await writer.drain()
        raw = await reader.readexactly(36)
        writer.close()
        await writer.wait_closed()
        return raw

    raw = _run_with_server(model, scenario)
    from bert_tpu.server import BIN_STATS2_MAGIC

    assert raw[:4] == BIN_STATS2_MAGIC
    served, batches, n, p50, p95, p99 = struct.unpack("<QQIIII", raw[4:])
    assert served >= 3 and batches >= 1
    assert n >= 3
    assert 0 < p50 <= p95 <= p99 < 60_000_000  # sane µs values


def test_stats2_percentiles_saturate_u32(model):
    """A pathological multi-hour latency sample (tunnel degradation) must
    saturate the u32 wire field, not blow up struct.pack in the STATS2
    handler."""
    from bert_tpu.server import BatchingScheduler

    sched = BatchingScheduler(model)
    sched.latencies.extend([0.001, 0.002, 5000.0])  # 5000 s > u32 µs max
    n, p50, p95, p99 = sched.latency_percentiles_us()
    assert n == 3 and p50 == 2000
    assert p99 == 0xFFFFFFFF
    struct.pack("<QQIIII", 0, 0, n, p50, p95, p99)  # packs cleanly


def test_bounded_queue_backpressure(model):
    """16x more work than queue_depth still completes: submit() suspends
    on the bounded queue (backpressure) instead of buffering unboundedly,
    while the consumer loop keeps draining — no deadlock, no loss."""
    from bert_tpu.server import BatchingScheduler

    async def go():
        sched = BatchingScheduler(model, max_batch=4, batch_window_ms=0.5,
                                  queue_depth=4)
        assert sched.queue.maxsize == 4
        sched.start()
        try:
            return await asyncio.gather(
                *[sched.submit(f"the store number {i}") for i in range(64)])
        finally:
            await sched.stop()

    outs = asyncio.run(go())
    assert len(outs) == 64
    assert all(o.shape == (CFG.n_embd,) for o in outs)


def test_queue_depth_zero_means_unbounded(model):
    """queue_depth=0 keeps asyncio's conventional meaning (unbounded),
    not a silent coercion to the default bound (ADVICE r3)."""
    from bert_tpu.server import BatchingScheduler

    sched = BatchingScheduler(model, max_batch=4, queue_depth=0)
    assert sched.queue.maxsize == 0          # asyncio: 0 = unbounded
    default = BatchingScheduler(model, max_batch=4)
    assert default.queue.maxsize == 4 * 128  # None → the default bound


def test_pipelined_frames_in_one_segment(model):
    """Two framed messages written in ONE TCP segment must both get
    replies (ADVICE r1: the old reader dropped leftover bytes)."""
    from bert_tpu.server import BIN_EVAL_MAGIC, BIN_META_MAGIC

    ids = model.tokenize("the store")

    async def scenario(server, port):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        (n_embd,) = struct.unpack("<i", await reader.readexactly(4))
        one = (BIN_EVAL_MAGIC + struct.pack("<i", len(ids))
               + np.asarray(ids, "<i4").tobytes())
        writer.write(one + one + BIN_META_MAGIC)  # three messages, one write
        await writer.drain()
        a = np.frombuffer(await reader.readexactly(n_embd * 4), "<f4").copy()
        b = np.frombuffer(await reader.readexactly(n_embd * 4), "<f4").copy()
        meta = await reader.readexactly(16)
        writer.close()
        await writer.wait_closed()
        return a, b, meta

    a, b, meta = _run_with_server(model, scenario)
    ref = model.encode("the store")
    np.testing.assert_allclose(a, ref, atol=1e-5)
    np.testing.assert_allclose(b, ref, atol=1e-5)
    from bert_tpu.server import BIN_META_MAGIC

    assert meta[:4] == BIN_META_MAGIC


def test_framed_batch_abuse_rejected(model):
    """Malformed batch frames (bad counts) close the connection without
    wedging the server; a healthy client still gets service afterwards."""
    from bert_tpu.server import BIN_BATCH_MAGIC

    async def scenario(server, port):
        outcomes = {}
        # negative sentence count
        r1, w1 = await asyncio.open_connection("127.0.0.1", port)
        await r1.readexactly(4)
        w1.write(BIN_BATCH_MAGIC + struct.pack("<i", -5))
        await w1.drain()
        outcomes["neg_count"] = await r1.read(16)
        w1.close()
        await w1.wait_closed()
        # huge per-sentence token count
        r2, w2 = await asyncio.open_connection("127.0.0.1", port)
        await r2.readexactly(4)
        w2.write(BIN_BATCH_MAGIC + struct.pack("<ii", 2, 1 << 29))
        await w2.drain()
        outcomes["huge_tokens"] = await r2.read(16)
        w2.close()
        await w2.wait_closed()
        # client disconnects mid-batch (frame promised 3, sends 1, hangs up)
        r3, w3 = await asyncio.open_connection("127.0.0.1", port)
        await r3.readexactly(4)
        w3.write(BIN_BATCH_MAGIC + struct.pack("<ii", 3, 2)
                 + np.asarray([101, 102], "<i4").tobytes())
        await w3.drain()
        w3.close()
        await w3.wait_closed()
        # server still serves a healthy client
        outcomes["healthy"] = await _client_roundtrip(port, ["the store"])
        return outcomes

    outcomes = _run_with_server(model, scenario)
    assert outcomes["neg_count"] == b""
    assert outcomes["huge_tokens"] == b""
    n_embd, outs = outcomes["healthy"]
    assert n_embd == CFG.n_embd and len(outs) == 1


def test_pipeline_depth_two(model):
    """pipeline_depth > 1 with genuinely overlapping batches: several
    concurrent clients each stream requests, so multiple micro-batches
    are in flight at once; every reply must match its request."""
    per_client = [["the store", "don't go"], ["going to", "anywhere"],
                  ["hello", "the store don't"], ["go going", "store store"]]

    async def scenario(server, port):
        outs = await asyncio.gather(*[
            _client_roundtrip(port, texts) for texts in per_client
        ])
        return outs

    results = _run_with_server(model, scenario, pipeline_depth=2,
                               max_batch=2, batch_window_ms=1.0)
    for texts, (_, outs) in zip(per_client, results):
        base = model.encode_batch(texts)
        for o, b in zip(outs, base):
            np.testing.assert_allclose(o, b, atol=1e-5)


def test_out_of_vocab_token_id_closes_connection(model):
    """A framed EVAL whose ids lie outside [0, n_vocab) must be rejected
    by closing — XLA's gather clamps out-of-range indices, so accepting
    the frame would SILENTLY embed the clamped vocab row (review r4)."""
    from bert_tpu.server import BIN_EVAL_MAGIC

    async def scenario(server, port):
        for bad in (model.n_vocab + 7, -3):
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            await reader.readexactly(4)
            writer.write(BIN_EVAL_MAGIC + struct.pack("<i", 3)
                         + np.asarray([101, bad, 102], "<i4").tobytes())
            await writer.drain()
            assert await reader.read(4) == b"", f"id {bad} not rejected"
            writer.close()
            await writer.wait_closed()
        # a valid frame on a fresh connection still works
        ids = model.tokenize("the store")
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        (n_embd,) = struct.unpack("<i", await reader.readexactly(4))
        writer.write(BIN_EVAL_MAGIC + struct.pack("<i", len(ids))
                     + np.asarray(ids, "<i4").tobytes())
        await writer.drain()
        out = np.frombuffer(await reader.readexactly(n_embd * 4), "<f4")
        writer.close()
        await writer.wait_closed()
        return out

    out = _run_with_server(model, scenario)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-4)


def test_failed_batch_not_counted_as_served(model):
    """STATS must not report failed evaluations as throughput — a device
    outage would otherwise look healthy to monitoring (review r4)."""
    from bert_tpu.server import BatchingScheduler

    async def go():
        sched = BatchingScheduler(model, max_batch=4, batch_window_ms=0.5)
        boom = {"on": True}
        real = sched._eval_mixed

        def eval_mixed(payloads):
            if boom["on"]:
                raise RuntimeError("device fell over")
            return real(payloads)

        sched._eval_mixed = eval_mixed
        sched.start()
        try:
            with pytest.raises(RuntimeError):
                await sched.submit("the store")
            assert (sched.n_served, sched.n_batches) == (0, 0)
            boom["on"] = False
            await sched.submit("the store")
            assert (sched.n_served, sched.n_batches) == (1, 1)
        finally:
            await sched.stop()

    asyncio.run(go())


def test_stop_fails_queued_uncollected_requests(model):
    """stop() must resolve futures still sitting in the queue (never
    collected into a batch) with ConnectionError — otherwise a client
    blocked in submit() hangs forever after shutdown (review r4)."""
    from bert_tpu.server import BatchingScheduler

    async def go():
        sched = BatchingScheduler(model, max_batch=4, batch_window_ms=0.5)
        # deliberately NOT started: queued items are never collected —
        # the same shape as requests enqueued after the collector died
        sub = asyncio.get_running_loop().create_task(
            sched.submit("the store"))
        await asyncio.sleep(0.05)  # let submit() enqueue its future
        await sched.stop()
        with pytest.raises(ConnectionError):
            await asyncio.wait_for(sub, timeout=5)

    asyncio.run(go())


class _SlowEvalModel:
    """Delegates to the real engine but holds each eval for `delay`
    seconds — makes 'device busy' deterministic for scheduler tests."""

    def __init__(self, inner, delay: float):
        self._inner = inner
        self.delay = delay
        self.tokenizer = inner.tokenizer
        self.n_max_tokens = inner.n_max_tokens

    def eval_tokens(self, toks):
        import time as _time

        _time.sleep(self.delay)
        return self._inner.eval_tokens(toks)


def test_adaptive_window_is_the_default(model):
    """VERDICT r4 #6: no fixed window default — 'adaptive' means zero
    collection wait, and a numeric value restores fixed-window mode."""
    from bert_tpu.server import BatchingScheduler

    sched = BatchingScheduler(model, max_batch=4)
    assert sched.adaptive and sched.batch_window == 0.0
    fixed = BatchingScheduler(model, max_batch=4, batch_window_ms=8.0)
    assert not fixed.adaptive and fixed.batch_window == 8e-3


def test_adaptive_immediate_dispatch_when_idle(model):
    """A lone request on an idle device must dispatch as a batch of 1
    without waiting out any window (the low-load p50 axis)."""
    from bert_tpu.server import BatchingScheduler

    async def go():
        sched = BatchingScheduler(model, max_batch=8)
        sched.start()
        try:
            t0 = asyncio.get_running_loop().time()
            out = await sched.submit("the store")
            dt = asyncio.get_running_loop().time() - t0
            return out, dt, sched.n_batches
        finally:
            await sched.stop()

    out, dt, n_batches = asyncio.run(go())
    assert out.shape == (CFG.n_embd,)
    assert n_batches == 1


def test_adaptive_coalesces_arrivals_while_device_busy(model):
    """While an eval is in flight, queued arrivals must ride the NEXT
    batch together (work-conserving continuous batching): 1 + 5 requests
    → exactly 2 batches, never 6."""
    from bert_tpu.server import BatchingScheduler

    slow = _SlowEvalModel(model, delay=0.4)

    async def go():
        sched = BatchingScheduler(slow, max_batch=8)
        sched.start()
        try:
            first = asyncio.get_running_loop().create_task(
                sched.submit("the store"))
            await asyncio.sleep(0.15)  # first batch now holds the device
            rest = [asyncio.get_running_loop().create_task(
                sched.submit(f"go to the store {i}")) for i in range(5)]
            outs = await asyncio.gather(first, *rest)
            return outs, sched.n_batches, sched.n_served
        finally:
            await sched.stop()

    outs, n_batches, n_served = asyncio.run(go())
    assert len(outs) == 6 and n_served == 6
    assert n_batches == 2, f"expected 1+5 coalescing, got {n_batches}"
    ref = model.encode("the store")
    np.testing.assert_allclose(outs[0], ref, atol=1e-5)


def test_stop_fails_collected_but_undispatched_requests(model):
    """Shutdown while a collected batch waits on the pipeline semaphore:
    those futures were already DEQUEUED, so the stop() queue-drain can't
    see them — the collector's cancel handler must fail them (a client
    blocked in submit() would otherwise hang forever)."""
    from bert_tpu.server import BatchingScheduler

    slow = _SlowEvalModel(model, delay=1.0)

    async def go():
        sched = BatchingScheduler(slow, max_batch=8)
        sched.start()
        first = asyncio.get_running_loop().create_task(
            sched.submit("the store"))
        await asyncio.sleep(0.2)   # first dispatched, holds the sem slot
        second = asyncio.get_running_loop().create_task(
            sched.submit("don't go"))
        await asyncio.sleep(0.2)   # second collected, blocked on the slot
        await sched.stop()
        with pytest.raises(ConnectionError):
            await asyncio.wait_for(second, timeout=5)
        # first was mid-eval → also failed by the in-flight cancel path
        with pytest.raises(ConnectionError):
            await asyncio.wait_for(first, timeout=5)

    asyncio.run(go())


def test_adaptive_patience_gates():
    """_adaptive_patience is zero until a step time is measured AND the
    concurrency EMA shows requests overlap (a lone client never waits);
    otherwise a fraction of one step, capped (round-5 sweep: immediate
    singleton dispatch onto an ~35 ms fixed-cost step halved low-load
    throughput vs an 8 ms window)."""
    from bert_tpu.server import BatchingScheduler

    sched = BatchingScheduler.__new__(BatchingScheduler)
    sched.patience_frac, sched.patience_cap = 0.25, 0.020
    sched._step_ema, sched._conc_ema = None, 1.0
    assert sched._adaptive_patience() == 0.0       # no step measured yet
    sched._step_ema, sched._conc_ema = 0.080, 0.0
    assert sched._adaptive_patience() == 0.0       # lone-client traffic
    sched._conc_ema = 1.0
    assert sched._adaptive_patience() == 0.020     # 0.25*80ms capped
    sched._step_ema = 0.004
    assert sched._adaptive_patience() == 0.001     # fast device: ~free


def test_adaptive_patience_coalesces_synchronized_arrivals(model):
    """With concurrency established, completion-synchronized low-load
    arrivals (the closed-loop client pattern) must ride ONE batch even
    when the device is idle — the cost-aware upgrade over pure
    immediate dispatch."""
    from bert_tpu.server import BatchingScheduler

    async def go():
        sched = BatchingScheduler(model, max_batch=8)
        # pretend history: ~80 ms steps, concurrent arrivals → 20 ms
        # patience at the slot-free moment; widen the straggler gap so
        # loop-scheduling jitter on a loaded 1-vCPU box can't race the
        # late arrivals past it
        sched._step_ema, sched._conc_ema = 0.080, 1.0
        sched.gap_cap = 0.050
        sched.start()
        try:
            loop = asyncio.get_running_loop()
            first = loop.create_task(sched.submit("the store"))
            await asyncio.sleep(0.001)  # arrive within the straggler gap
            rest = [loop.create_task(sched.submit(f"go to the store {i}"))
                    for i in range(3)]
            outs = await asyncio.gather(first, *rest)
            return outs, sched.n_batches
        finally:
            await sched.stop()

    outs, n_batches = asyncio.run(go())
    assert len(outs) == 4
    assert n_batches == 1, f"expected one coalesced batch, got {n_batches}"


def test_adaptive_heals_fragmented_closed_loop_clients(model):
    """Two closed-loop clients that start split (1+1) must coalesce: the
    concurrency indicator (a request arriving while a slot is busy)
    enables the completion-wave hold even though a 1+1 split's fill EMA
    never exceeds 1 — the round-5 trace bug class, where a 1+3 split
    self-sustained because the top-up fired before the completed batch's
    clients could resubmit."""
    from bert_tpu.server import BatchingScheduler

    async def go():
        sched = BatchingScheduler(_SlowEvalModel(model, 0.03), max_batch=8)
        sched.start()
        try:
            async def client(i, n):
                for k in range(n):
                    await sched.submit(f"client {i} trip {k} to the store")

            loop = asyncio.get_running_loop()
            a = loop.create_task(client(0, 8))
            await asyncio.sleep(0.015)   # land mid-eval: start fragmented
            b = loop.create_task(client(1, 8))
            await asyncio.gather(a, b)
            return sched.n_batches, sched.n_served
        finally:
            await sched.stop()

    n_batches, n_served = asyncio.run(go())
    assert n_served == 16
    # fully fragmented = 16 singleton batches; healed steady state rides
    # 2 per batch (~9-10 total with the fragmented prefix)
    assert n_batches <= 12, f"fragmentation never healed: {n_batches} batches"
