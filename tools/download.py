#!/usr/bin/env python
"""Download prebuilt ggml models from the HF hub
(counterpart of models/download-ggml.py; repo skeskinen/ggml).

Usage:
  python tools/download.py list
  python tools/download.py download <model-name> <f32|f16|q4_0|q4_1> [dest]

Requires network access; prints a clear error offline.
"""
import os
import sys

MODELS = [  # the set published for the reference (models/download-ggml.py)
    "all-MiniLM-L6-v2",
    "all-MiniLM-L12-v2",
    "bert-base-uncased",
    "multi-qa-MiniLM-L6-cos-v1",
    "paraphrase-multilingual-MiniLM-L12-v2",
]
REPO = "skeskinen/ggml"
DTYPES = ("f32", "f16", "q4_0", "q4_1")


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("list", "download"):
        sys.exit(__doc__)
    if sys.argv[1] == "list":
        print("\n".join(MODELS))
        return
    if len(sys.argv) < 4 or sys.argv[3] not in DTYPES:
        sys.exit(__doc__)
    name, dtype = sys.argv[2], sys.argv[3]
    dest = sys.argv[4] if len(sys.argv) > 4 else f"models/{name}"
    fname = f"{name}/ggml-model-{dtype}.bin"
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        sys.exit("huggingface_hub is not installed in this environment")
    try:
        os.makedirs(dest, exist_ok=True)
        path = hf_hub_download(repo_id=REPO, filename=fname,
                               local_dir=os.path.dirname(dest) or ".")
        print(f"downloaded to {path}")
    except Exception as exc:
        sys.exit(f"download failed (offline / zero-egress sandbox?): {exc}")


if __name__ == "__main__":
    main()
