"""AutoInference host API surface (reference interface.py:145-283 parity)."""

import numpy as np
import pytest

from vsim_tpu.api.interface import MAP_MODEL_TO_URL, AutoInference

from test_model_parity import _hf_model


class DummyTokenizer:
    def encode(self, text):
        return [1 + (ord(c) % 90) for c in text][:8]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def ai():
    model = _hf_model("gptneox")
    return AutoInference(
        "test/tiny-neox", hf_model=model, tokenizer=DummyTokenizer(), n_ctx=64
    )


def test_registry_covers_reference_models():
    # the 14 models registered by the reference (interface.py:92-143)
    assert len(MAP_MODEL_TO_URL) == 14
    archs = {e.cpp_model_name for e in MAP_MODEL_TO_URL.values()}
    assert archs == {"gptneox", "gptj", "bloom", "gpt2"}
    assert MAP_MODEL_TO_URL[
        "OpenAssistant/oasst-sft-1-pythia-12b"].get_modes() == [
        "int4_fixed_zero"]


def test_generate_result_shape(ai):
    out = ai.generate("hello", num_tokens_to_generate=5, greedy=True,
                      stop_tokens=())
    assert out["success"] is True
    assert len(out["generated_token_ids"]) == 5
    assert out["token_ids"][: len(out["token_ids"]) - 5] == ai.tokenizer.encode(
        "hello")
    assert isinstance(out["token_str"], str)


def test_streaming_hooks(ai):
    ids_seen, strs_seen = [], []
    out = ai.generate(
        [1, 2, 3], num_tokens_to_generate=4, greedy=True, stop_tokens=(),
        streaming_token_ids_hook=ids_seen.append,
        streaming_token_str_hook=strs_seen.append,
    )
    assert ids_seen == out["generated_token_ids"]
    assert len(strs_seen) == 4


def test_return_logits_protocol(ai):
    lg = ai.return_logits([1, 2, 3, 4, 5])
    assert lg.shape == (5, ai.config.n_vocab)
    # greedy chain consistency with generate()
    out = ai.generate([1, 2, 3, 4, 5], num_tokens_to_generate=1, greedy=True,
                      stop_tokens=())
    assert out["generated_token_ids"][0] == int(np.argmax(lg[-1]))


def test_seeded_generation_reproducible(ai):
    a = ai.generate([5, 6, 7], num_tokens_to_generate=8, seed=42,
                    stop_tokens=())
    b = ai.generate([5, 6, 7], num_tokens_to_generate=8, seed=42,
                    stop_tokens=())
    assert a["token_ids"] == b["token_ids"]


def test_eos_stops_generation(ai):
    out = ai.generate([1, 2, 3], num_tokens_to_generate=30, greedy=True,
                      stop_tokens=range(96))
    assert len(out["generated_token_ids"]) == 1


def test_unknown_model_rejected():
    with pytest.raises(ValueError, match="unknown model"):
        AutoInference("not/a-model")


# -- download integrity (atomic temp-path download + resume + sha256 pin) ----


def _serve_once(payload: bytes, fail_after=None):
    """Tiny HTTP server supporting Range; returns (url, shutdown)."""
    import http.server
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            start = 0
            rng = self.headers.get("Range")
            if rng:
                start = int(rng.split("=")[1].rstrip("-"))
                if start >= len(payload):
                    self.send_response(416)
                    self.end_headers()
                    return
                self.send_response(206)
            else:
                self.send_response(200)
            body = payload[start:]
            if fail_after is not None and start == 0:
                body = body[:fail_after]  # truncated first response
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{srv.server_address[1]}/f.bin", srv.shutdown


def test_download_atomic_and_resumable(tmp_path):
    from vsim_tpu.api.interface import _download

    payload = bytes(range(256)) * 1000
    url, shutdown = _serve_once(payload)
    try:
        dest = str(tmp_path / "model.bin")
        # simulate an interrupted previous download: stale .part prefix
        with open(dest + ".part", "wb") as f:
            f.write(payload[:10_000])
        _download(url, dest)
        assert open(dest, "rb").read() == payload
        assert not (tmp_path / "model.bin.part").exists()
    finally:
        shutdown()


def test_sha256_pin_detects_corruption(tmp_path, monkeypatch, capsys):
    import vsim_tpu.api.interface as iface

    monkeypatch.setattr(iface, "CACHE_PATH", str(tmp_path))
    payload = b"model-bytes" * 100
    url, shutdown = _serve_once(payload)
    try:
        monkeypatch.setitem(
            iface.MAP_MODEL_TO_URL, "test/tiny",
            iface.ModelUrlMap("gptneox", url))
        ai = object.__new__(iface.AutoInference)
        ai.model_name, ai.mode = "test/tiny", "int4_fixed_zero"
        path = ai._resolve_model_path()
        assert open(path, "rb").read() == payload
        pin = open(path + ".sha256").read().strip()
        assert pin == iface._sha256(path)
        # pristine re-resolve: no warning
        ai._resolve_model_path()
        assert "WARNING" not in capsys.readouterr().out
        # corrupt the cached file: pin check must fire
        with open(path, "ab") as f:
            f.write(b"junk")
        ai._resolve_model_path()
        assert "sha256" in capsys.readouterr().out
    finally:
        shutdown()


def test_vocab_tokenizer_roundtrip():
    """Model-file vocab fallback (reference vsim.cpp:127-174 + gpt_tokenize
    utils.cpp:192-237): decode joins vocab bytes; encode greedy-matches the
    longest entry."""
    from vsim_tpu.api.interface import VocabTokenizer

    vocab = [b"<unk>", b"hello", b" world", b"hel", b"lo", b" ", b"w", b"o",
             b"r", b"l", b"d", b"!"]
    tok = VocabTokenizer(vocab)
    ids = tok.encode("hello world!")
    # greedy longest-match picks the full-word entries
    assert ids == [1, 2, 11]
    assert tok.decode(ids) == "hello world!"
    # unmappable bytes are skipped, out-of-range ids ignored in decode
    assert tok.encode("hello\x00world!") == [1, 6, 7, 8, 9, 10, 11]
    assert tok.decode([1, 999]) == "hello"
