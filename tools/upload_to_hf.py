#!/usr/bin/env python
"""Upload converted/quantized ggml model files to a HF hub repo
(counterpart of models/upload-to-hf.py). Requires network + auth.

Usage: python tools/upload_to_hf.py <model-dir> <repo-id>
"""
import os
import sys

DTYPES = ("f32", "f16", "q4_0", "q4_1")


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    model_dir, repo_id = sys.argv[1:3]
    try:
        from huggingface_hub import HfApi
    except ImportError:
        sys.exit("huggingface_hub is not installed in this environment")
    api = HfApi()
    name = os.path.basename(os.path.normpath(model_dir))
    for dtype in DTYPES:
        path = os.path.join(model_dir, f"ggml-model-{dtype}.bin")
        if not os.path.exists(path):
            print(f"skip {path} (missing)")
            continue
        print(f"uploading {path} ...")
        api.upload_file(
            path_or_fileobj=path,
            path_in_repo=f"{name}/ggml-model-{dtype}.bin",
            repo_id=repo_id,
        )


if __name__ == "__main__":
    main()
