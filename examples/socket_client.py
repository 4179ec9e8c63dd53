#!/usr/bin/env python
"""Socket client for the embedding server — counterpart of the reference's
examples/sample_client.py and byte-compatible with BOTH servers (this
framework's bert_tpu.server and the reference C++ server): int32 n_embd
handshake, UTF-8 text per message, raw f32 vector replies.

Usage: python examples/socket_client.py [--host H] [--port P] [corpus.txt]
"""
import argparse
import os
import socket
import struct
import sys

import numpy as np


class EmbeddingClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 8085):
        self.sock = socket.create_connection((host, port))
        (self.n_embd,) = struct.unpack("<i", self._recv_exact(4))

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed connection")
            buf += chunk
        return buf

    def encode(self, text: str) -> np.ndarray:
        # the wire protocol is unframed: one server read of ≤ 32 KiB per
        # message (reference server.cpp:27), so longer text MUST be
        # truncated or the stream desynchronizes
        self.sock.sendall(text.encode("utf-8")[: (1 << 15) - 1])
        return np.frombuffer(self._recv_exact(self.n_embd * 4), "<f4").copy()

    def close(self) -> None:
        self.sock.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8085)
    ap.add_argument("corpus", nargs="?", default=None)
    args = ap.parse_args()

    client = EmbeddingClient(args.host, args.port)
    print(f"connected; n_embd = {client.n_embd}")

    corpus, corpus_emb = [], None
    corpus_path = args.corpus
    if corpus_path is None:
        # shipped default corpus (examples/corpus.txt, 1,300+ lines) —
        # counterpart of the reference's examples/sample_client_texts.txt
        default = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "corpus.txt")
        if os.path.exists(default):
            corpus_path = default
    if corpus_path:
        with open(corpus_path, encoding="utf-8") as f:
            corpus = [ln.strip() for ln in f if ln.strip()]
        print(f"embedding {len(corpus)} corpus lines via server ...")
        corpus_emb = np.stack([client.encode(t) for t in corpus])

    while True:
        try:
            text = input("> ").strip()
        except EOFError:
            break
        if not text:
            break
        emb = client.encode(text)
        if corpus_emb is not None:
            sims = corpus_emb @ emb
            for i in np.argsort(-sims)[:3]:
                print(f"  {sims[i]:.4f}  {corpus[i]}")
        else:
            print(f"  embedding[:8] = {emb[:8]}")
    client.close()


if __name__ == "__main__":
    main()
