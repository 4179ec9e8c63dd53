"""Execute the hub tools (tools/download.py, tools/upload_to_hf.py) end to
end against a LOCAL HuggingFace-endpoint stub.

The reference's model distribution story is `models/download-ggml.py` and
`models/upload-to-hf.py` hitting the real hub; zero-egress here, but
`huggingface_hub` honors ``HF_ENDPOINT``, so a loopback HTTP server that
speaks the resolve/preupload/commit subset of the hub API lets both tools
run their real code paths: hf_hub_download's metadata HEAD + streamed GET,
and HfApi.upload_file's preupload → NDJSON commit (regular upload mode).
This covers VERDICT r2's P2/P3 "correct-looking, never executed" gap —
everything short of the real network runs for real.
"""

import base64
import json
import os
import subprocess
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO_ROOT, "tools")

pytest.importorskip("huggingface_hub")

FAKE_COMMIT = "0123456789abcdef0123456789abcdef01234567"


class _HubStub(BaseHTTPRequestHandler):
    """Minimal hub API: serves one repo's files from `store` (a dict
    path→bytes shared with the test) and accepts regular-mode commits
    back into it."""

    store: dict  # class attr, set by fixture
    log: list

    def log_message(self, *a):  # silence request logging
        pass

    def _file_key(self):
        # /{user}/{repo}/resolve/{rev}/{path...}
        parts = self.path.split("/resolve/", 1)
        if len(parts) != 2:
            return None
        return parts[1].split("/", 1)[1]  # drop revision

    def do_HEAD(self):
        key = self._file_key()
        if key is None or key not in self.store:
            self.send_error(404)
            return
        body = self.store[key]
        self.send_response(200)
        self.send_header("X-Repo-Commit", FAKE_COMMIT)
        self.send_header("ETag", '"%032x"' % (len(body) * 7919))
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):
        key = self._file_key()
        if key is not None and key in self.store:
            body = self.store[key]
            self.send_response(200)
            self.send_header("X-Repo-Commit", FAKE_COMMIT)
            self.send_header("ETag", '"%032x"' % (len(body) * 7919))
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        # generic API info (repo_info etc.) — enough for the client
        self.send_response(200)
        payload = json.dumps({"id": "stub", "siblings": []}).encode()
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        self.log.append(self.path)
        if "/preupload/" in self.path:
            req = json.loads(body)
            resp = {"files": [
                {"path": f["path"], "uploadMode": "regular",
                 "shouldIgnore": False} for f in req.get("files", [])]}
        elif "/commit/" in self.path:
            # NDJSON: header line + file lines with base64 content
            for line in body.decode().splitlines():
                rec = json.loads(line)
                if rec.get("key") == "file":
                    v = rec["value"]
                    self.store[v["path"]] = base64.b64decode(v["content"])
            # client parses commitUrl as {endpoint}/{repo_id}/commit/{oid}
            repo = self.path.split("/api/models/", 1)[1].split("/commit/")[0]
            resp = {"commitUrl": "http://%s/%s/commit/%s" % (
                        self.headers["Host"], repo, FAKE_COMMIT),
                    "commitOid": FAKE_COMMIT, "hookOutput": ""}
        else:
            resp = {}
        payload = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def tiny_model_bytes(tmp_path_factory):
    """A real (tiny, q4_0) ggml model file — the download must LOAD."""
    from bert_tpu.formats import GgmlHParams, write_ggml
    from bert_tpu.params import BertConfig, random_named_tensors
    from fixture_vocab import build_fixture_tokens

    cfg = BertConfig(n_vocab=30522, n_max_tokens=64, n_embd=64,
                     n_intermediate=128, n_head=4, n_layer=2)
    hp = GgmlHParams(cfg.n_vocab, cfg.n_max_tokens, cfg.n_embd,
                     cfg.n_intermediate, cfg.n_head, cfg.n_layer, ftype=2)
    p = str(tmp_path_factory.mktemp("hub") / "tiny-q4_0.bin")
    write_ggml(p, hp, build_fixture_tokens(), random_named_tensors(cfg, 3))
    with open(p, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def hub(tiny_model_bytes):
    _HubStub.store = {
        "all-MiniLM-L6-v2/ggml-model-q4_0.bin": tiny_model_bytes}
    _HubStub.log = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _HubStub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, _HubStub.store, _HubStub.log
    srv.shutdown()


def _tool_env(endpoint: str, tmp: str) -> dict:
    env = dict(os.environ)
    env.update({
        "HF_ENDPOINT": endpoint,
        "HF_HOME": os.path.join(tmp, "hf_home"),  # isolate cache
        "HF_HUB_DISABLE_XET": "1",     # hf_xet is installed; force HTTP
        "HF_HUB_DISABLE_TELEMETRY": "1",
        "HF_HUB_DISABLE_PROGRESS_BARS": "1",
        "HF_TOKEN": "hf_stubtokenstubtokenstub",
    })
    env.pop("HF_HUB_OFFLINE", None)
    return env


def test_download_tool_fetches_and_loads(hub, tmp_path):
    srv, _, _ = hub
    endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
    dest = str(tmp_path / "models" / "all-MiniLM-L6-v2")
    out = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "download.py"), "download",
         "all-MiniLM-L6-v2", "q4_0", dest],
        capture_output=True, text=True, timeout=120,
        env=_tool_env(endpoint, str(tmp_path)))
    assert out.returncode == 0, out.stderr
    assert "downloaded to " in out.stdout
    path = out.stdout.rsplit("downloaded to ", 1)[1].strip()
    assert os.path.exists(path), out.stdout

    from bert_tpu.loader import load_ggml_model

    m = load_ggml_model(path)
    assert m.config.n_embd == 64 and m.config.n_layer == 2


def test_download_tool_list(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "download.py"), "list"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0
    assert "all-MiniLM-L6-v2" in out.stdout


def test_upload_tool_round_trips(hub, tmp_path, tiny_model_bytes):
    srv, store, log = hub
    endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
    mdir = tmp_path / "up" / "tiny-model"
    mdir.mkdir(parents=True)
    (mdir / "ggml-model-q4_0.bin").write_bytes(tiny_model_bytes)
    out = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "upload_to_hf.py"),
         str(mdir), "someuser/bert-ggml"],
        capture_output=True, text=True, timeout=120,
        env=_tool_env(endpoint, str(tmp_path)))
    assert out.returncode == 0, out.stderr
    assert "uploading" in out.stdout
    # skipped dtypes are reported, not fatal (reference tool behavior)
    assert out.stdout.count("skip") == 3
    # the commit landed the exact bytes under the tool's path_in_repo
    assert store.get("tiny-model/ggml-model-q4_0.bin") == tiny_model_bytes
    assert any("/preupload/" in p for p in log)
    assert any("/commit/" in p for p in log)
