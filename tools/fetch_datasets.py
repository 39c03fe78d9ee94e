"""CLI: fetch (or ingest) the real training datasets.

The reference downloads its data lazily at dataset-construction time
(/root/reference/xdiffusion/datasets/moving_mnist.py:122-132 pulls a
Google-Drive archive; torchvision fetches MNIST). This repo is
offline-first — every dataset silently degrades to the deterministic
synthetic stand-in when archives are absent — so ingestion is an EXPLICIT
step instead: run this tool once on a machine with network (or point it
at archives you already have) and every loader will pick the real data up
from XDIFFUSION_DATA_DIR on the next run.

Usage:
  python tools/fetch_datasets.py --dataset mnist            # download
  python tools/fetch_datasets.py --dataset all
  python tools/fetch_datasets.py --dataset mnist \
      --from-archive /path/to/mnist-idx-dir                 # local ingest
"""

import argparse
import gzip
import os
import shutil
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xdiffusion_tpu.datasets.mnist import data_root  # noqa: E402

# Canonical public mirrors. MNIST: the original yann.lecun.com host
# frequently 403s; ossci-datasets is the torchvision mirror of the same
# IDX files. Moving-MNIST: the U-Toronto archive is the dataset's
# canonical host (the reference's Google-Drive file is a re-upload of the
# same 10k-sequence .npy).
MNIST_FILES = [
    "train-images-idx3-ubyte.gz",
    "train-labels-idx1-ubyte.gz",
    "t10k-images-idx3-ubyte.gz",
    "t10k-labels-idx1-ubyte.gz",
]
MNIST_MIRRORS = [
    "https://ossci-datasets.s3.amazonaws.com/mnist/",
    "https://storage.googleapis.com/cvdf-datasets/mnist/",
]
MOVING_MNIST_URL = (
    "https://www.cs.toronto.edu/~nitish/unsupervised_video/mnist_test_seq.npy"
)
CIFAR10_URL = (
    "https://www.cs.toronto.edu/~kriz/cifar-10-binary.tar.gz"
)
URBANSOUND8K_NOTE = (
    "urbansound8k requires accepting a license; download UrbanSound8K.tar.gz "
    "from https://urbansounddataset.weebly.com/urbansound8k.html and pass "
    "--from-archive."
)


def _download(url: str, dest: str) -> bool:
    try:
        print(f"fetching {url} -> {dest}", flush=True)
        with urllib.request.urlopen(url, timeout=60) as r, open(
            dest + ".part", "wb"
        ) as f:
            shutil.copyfileobj(r, f)
        os.replace(dest + ".part", dest)
        return True
    except Exception as e:  # noqa: BLE001 — report and try next mirror
        print(f"  failed: {e}", flush=True)
        return False


def fetch_mnist(from_archive=None) -> bool:
    base = os.path.join(data_root(), "mnist")
    os.makedirs(base, exist_ok=True)
    ok = True
    for name in MNIST_FILES:
        dest = os.path.join(base, name)
        plain = dest[: -len(".gz")]
        if os.path.exists(dest) or os.path.exists(plain):
            continue
        if from_archive:
            src = None
            for cand in (name, name[: -len(".gz")]):
                p = os.path.join(from_archive, cand)
                if os.path.exists(p):
                    src = p
                    break
            if src is None:
                print(f"  {name} not found in {from_archive}")
                ok = False
                continue
            shutil.copy(src, os.path.join(base, os.path.basename(src)))
            continue
        if not any(_download(m + name, dest) for m in MNIST_MIRRORS):
            ok = False
    return ok


def fetch_moving_mnist(from_archive=None) -> bool:
    base = os.path.join(data_root(), "moving_mnist")
    os.makedirs(base, exist_ok=True)
    dest = os.path.join(base, "mnist_test_seq.npy")
    if os.path.exists(dest):
        return True
    if from_archive:
        src = (
            from_archive
            if os.path.isfile(from_archive)
            else os.path.join(from_archive, "mnist_test_seq.npy")
        )
        if os.path.exists(src):
            shutil.copy(src, dest)
            return True
        print(f"  mnist_test_seq.npy not found at {from_archive}")
        return False
    return _download(MOVING_MNIST_URL, dest)


def fetch_cifar10(from_archive=None) -> bool:
    base = os.path.join(data_root(), "cifar10")
    os.makedirs(base, exist_ok=True)
    dest = os.path.join(base, "cifar-10-binary.tar.gz")
    if os.path.exists(dest) or os.path.exists(
        os.path.join(base, "cifar-10-batches-bin")
    ):
        return _extract_cifar(base, dest)
    if from_archive:
        src = (
            from_archive
            if os.path.isfile(from_archive)
            else os.path.join(from_archive, "cifar-10-binary.tar.gz")
        )
        if not os.path.exists(src):
            print(f"  cifar-10-binary.tar.gz not found at {from_archive}")
            return False
        shutil.copy(src, dest)
        return _extract_cifar(base, dest)
    if not _download(CIFAR10_URL, dest):
        return False
    return _extract_cifar(base, dest)


def _extract_cifar(base: str, tarball: str) -> bool:
    out = os.path.join(base, "cifar-10-batches-bin")
    if os.path.isdir(out):
        return True
    if not os.path.exists(tarball):
        return False
    import tarfile

    with tarfile.open(tarball, "r:gz") as t:
        t.extractall(base)
    return os.path.isdir(out)


FETCHERS = {
    "mnist": fetch_mnist,
    "moving_mnist": fetch_moving_mnist,
    "cifar10": fetch_cifar10,
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--dataset",
        choices=sorted(FETCHERS) + ["all"],
        required=True,
    )
    p.add_argument(
        "--from-archive",
        type=str,
        default=None,
        help="ingest from a local directory/file instead of the network",
    )
    args = p.parse_args()

    names = sorted(FETCHERS) if args.dataset == "all" else [args.dataset]
    failed = []
    for name in names:
        print(f"== {name} -> {data_root()}", flush=True)
        if not FETCHERS[name](from_archive=args.from_archive):
            failed.append(name)
    if failed:
        print(f"FAILED: {failed}", flush=True)
        print(URBANSOUND8K_NOTE, flush=True)
        sys.exit(1)
    print("all requested datasets ready", flush=True)


if __name__ == "__main__":
    main()
