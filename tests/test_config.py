"""CFG: derivation, serialization round-trip, derived sizes."""

import jax

from edge_diffusion_tts_tpu.config import CFG, TrainPhase, hubert_num_frames


def test_segment_len_derivation():
    cfg = CFG(segment_secs=2.0, sample_rate=16000)
    assert cfg.segment_len == 32000
    assert cfg.segment_len % 320 == 0
    cfg2 = CFG(segment_secs=1.9, sample_rate=16000)
    assert cfg2.segment_len == (int(16000 * 1.9) // 320) * 320


def test_json_roundtrip(tmp_path):
    cfg = CFG(out_dir=str(tmp_path), phase=TrainPhase.CONSISTENCY, hidden=96)
    d = cfg.to_dict()
    assert d["phase"] == "consistency"
    cfg2 = CFG.from_dict(d)
    assert cfg2.phase == TrainPhase.CONSISTENCY
    assert cfg2.hidden == 96
    assert cfg2.segment_len == cfg.segment_len
    # unknown keys ignored
    d["not_a_field"] = 1
    CFG.from_dict(d)


def test_effective_codebook_size():
    cfg = CFG(use_fsq=True)
    assert cfg.effective_codebook_size() == 4 * 4 * 3 * 3 * 2 * 2 * 2 * 2  # 2304
    cfg2 = CFG(use_fsq=False, codebook_size=512)
    assert cfg2.effective_codebook_size() == 512


def test_derived_frame_counts():
    cfg = CFG()
    assert cfg.segment_mel_frames == 32000 // 160 + 1  # 201, matches torchaudio
    # HuBERT-base: 32000 samples -> 99 frames (hop 320, receptive field 400)
    assert cfg.segment_sem_frames == hubert_num_frames(32000)
    assert hubert_num_frames(16000 * 5) == 249


def test_set_seed_returns_key():
    cfg = CFG()
    key = cfg.setup_environment()
    assert isinstance(key, jax.Array)


def test_no_dead_cfg_fields():
    """Every CFG field must be consumed somewhere outside config.py.

    The reference carries torch-specific knobs it never reads on some paths;
    this framework's standard (enforced since round 1) is that every config
    field is wired or deleted.  Guards against regressions when new fields
    land."""
    import dataclasses
    import io
    import pathlib
    import re
    import tokenize

    def code_only(src: str) -> str:
        """Drop comments and docstrings/bare-string statements so a field
        name mentioned only in prose does not count as 'consumed'.  Inline
        strings (argparse flags, dict keys) are kept — those are real
        consumption sites."""
        out = []
        prev_sig = None  # last significant token type
        boundary = (
            tokenize.NEWLINE, tokenize.NL, tokenize.INDENT, tokenize.DEDENT,
        )
        try:
            for t in tokenize.generate_tokens(io.StringIO(src).readline):
                if t.type == tokenize.COMMENT:
                    continue
                if t.type == tokenize.STRING and (
                    prev_sig is None or prev_sig in boundary
                ):
                    continue  # expression-statement string = docstring
                if t.type not in (
                    tokenize.ENCODING, tokenize.ENDMARKER, tokenize.NL,
                ):
                    if t.type not in (tokenize.NEWLINE, tokenize.INDENT,
                                      tokenize.DEDENT):
                        out.append(t.string)
                    prev_sig = t.type
        except tokenize.TokenError:
            return src
        return " ".join(out)

    root = pathlib.Path(__file__).resolve().parents[1]
    sources = []
    for pat in (
        "edge_diffusion_tts_tpu/**/*.py",
        "bench*.py",
        "__graft_entry__.py",
        "tools/*.py",
    ):
        sources += [p for p in root.glob(pat) if p.name != "config.py"]
    blob = "\n".join(code_only(p.read_text()) for p in sources)
    dead = [
        f.name
        for f in dataclasses.fields(CFG)
        if not re.search(rf"\b{re.escape(f.name)}\b", blob)
    ]
    assert not dead, f"CFG fields consumed by nothing: {dead}"
