"""CLI: precompute Gemma-2 text embeddings for the MNIST prompts
(reference tool surface: tools/create_mnist_embeddings_gemma_2.py:22).

Embeds the 20 prompt surface forms (10 digits x 2 forms) to (300, 2304)
each and writes {data_root}/mnist_gemma2/embeddings.npz. Uses a locally
cached google/gemma-2 model when available; otherwise writes the
deterministic hash-fallback embeddings so downstream training is
reproducible either way.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description="Precompute Gemma-2 embeddings.")
    p.add_argument("--model_name", type=str, default="google/gemma-2-2b")
    p.add_argument("--output_path", type=str, default="")
    args = p.parse_args()

    from xdiffusion_tpu.datasets.mnist import _TEXT_FORMS, data_root
    from xdiffusion_tpu.datasets.mnist_embedded_gemma_2 import _hash_embedding

    embeddings = None
    try:
        from transformers import AutoModel, AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.model_name, local_files_only=True)
        model = AutoModel.from_pretrained(args.model_name, local_files_only=True)
        import torch

        rows = []
        for forms in _TEXT_FORMS:
            per_digit = []
            for form in forms:
                inputs = tok(
                    form,
                    return_tensors="pt",
                    padding="max_length",
                    max_length=300,
                    truncation=True,
                )
                with torch.no_grad():
                    out = model(**inputs).last_hidden_state[0]
                per_digit.append(out.float().numpy())
            rows.append(np.stack(per_digit))
        embeddings = np.stack(rows)
        print(f"embedded with {args.model_name}")
    except Exception as e:
        print(f"no local Gemma-2 ({type(e).__name__}); writing hash fallback")
        embeddings = np.stack(
            [
                np.stack([_hash_embedding(form) for form in forms])
                for forms in _TEXT_FORMS
            ]
        )

    out_dir = args.output_path or os.path.join(data_root(), "mnist_gemma2")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "embeddings.npz")
    np.savez_compressed(out, embeddings=embeddings.astype(np.float32))
    print(f"wrote {out}: {embeddings.shape}")


if __name__ == "__main__":
    main()
