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
