"""Package the framework into a self-contained Colab/Kaggle TPU notebook.

Capability parity with the reference's generate_notebook.py (reference:
generate_notebook.py:100-124, which base64-embeds a zip of the source into
colab_training.ipynb).  The generated notebook: unpacks the embedded source,
checks for a TPU runtime, downloads LJSpeech, and launches the v2 training
recipe.

Usage:  python tools/make_notebook.py [out.ipynb]
"""

from __future__ import annotations

import base64
import io
import json
import os
import sys
import zipfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
PKG = "edge_diffusion_tts_tpu"


def build_zip() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith((".py",)):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
        for extra in ("bench.py",):
            z.write(os.path.join(REPO, extra), extra)
        native = os.path.join(REPO, "native", "wavio.cpp")
        if os.path.exists(native):
            z.write(native, "native/wavio.cpp")
    return buf.getvalue()


def make_notebook(out_path: str):
    payload = base64.b64encode(build_zip()).decode()
    cells = [
        {
            "cell_type": "markdown",
            "metadata": {},
            "source": [
                "# Edge Diffusion TTS — TPU-native training\n",
                "Select a TPU runtime, then run all cells.\n",
            ],
        },
        {
            "cell_type": "code",
            "metadata": {},
            "execution_count": None,
            "outputs": [],
            "source": [
                "import base64, io, zipfile\n",
                f"SRC = '{payload}'\n",
                "zipfile.ZipFile(io.BytesIO(base64.b64decode(SRC))).extractall('.')\n",
                "print('source unpacked')\n",
            ],
        },
        {
            "cell_type": "code",
            "metadata": {},
            "execution_count": None,
            "outputs": [],
            "source": [
                "import jax\n",
                "print('backend:', jax.default_backend(), jax.devices())\n",
            ],
        },
        {
            "cell_type": "code",
            "metadata": {},
            "execution_count": None,
            "outputs": [],
            "source": [
                "!test -d data/LJSpeech-1.1 || (wget -q "
                "https://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2 "
                "&& mkdir -p data && tar -xjf LJSpeech-1.1.tar.bz2 -C data)\n",
            ],
        },
        {
            "cell_type": "code",
            "metadata": {},
            "execution_count": None,
            "outputs": [],
            "source": [
                "from edge_diffusion_tts_tpu.config import CFG\n",
                "from edge_diffusion_tts_tpu.training import train_v2\n",
                "cfg = CFG(batch_size=32, grad_accumulation=1)\n",
                "state = train_v2(cfg)\n",
            ],
        },
    ]
    nb = {
        "cells": cells,
        "metadata": {
            "language_info": {"name": "python"},
            "accelerator": "TPU",
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    with open(out_path, "w") as f:
        json.dump(nb, f)
    print(f"wrote {out_path} ({os.path.getsize(out_path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    make_notebook(sys.argv[1] if len(sys.argv) > 1 else "colab_training.ipynb")
