"""Guard the bench scripts' model configs against drift from the CLI's
reference defaults (both mirror the reference's per-script set_defaults;
bench/_protocol.py is the bench-side single source)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "bench"))

from _protocol import CONFIGS, CRNN_CONFIGS, PROTOCOL_SHAPE

from cinemri_tpu.cli.common import MODEL_DEFAULTS


class TestProtocolConfigsMatchCLI:
    def test_varnet(self):
        d = MODEL_DEFAULTS["varnet"]
        c = CONFIGS["varnet"]
        assert c == dict(num_cascades=d["num_cascades"], sens_chans=d["sens_chans"],
                         sens_pools=d["sens_pools"], chans=d["chans"], pools=d["pools"])
        r = CRNN_CONFIGS["varnet"]
        assert r == dict(num_cascades=d["num_cascades"], sens_chans=d["sens_chans"],
                         sens_pools=d["sens_pools"], chans=d["chans"])

    def test_cinenet(self):
        d = MODEL_DEFAULTS["cinenet"]
        c = CONFIGS["cinenet"]
        assert c == dict(num_cascades=d["num_cascades"], cg_iters=d["CG_iters"],
                         chans=d["chans"], pools=d["pools"])
        r = CRNN_CONFIGS["cinenet"]
        assert r == dict(num_cascades=d["num_cascades"], cg_iters=d["CG_iters"],
                         chans=d["chans"])

    def test_xpdnet(self):
        d = MODEL_DEFAULTS["xpdnet"]
        c = CONFIGS["xpdnet"]
        assert c == dict(num_cascades=d["num_cascades"], sens_chans=d["sens_chans"],
                         sens_pools=d["sens_pools"], n_scales=d["n_scales"],
                         n_filters_per_scale=tuple(d["n_filters_per_scale"]),
                         n_primal=d["n_primal"])
        r = CRNN_CONFIGS["xpdnet"]
        assert r == dict(num_cascades=d["num_cascades"], sens_chans=d["sens_chans"],
                         sens_pools=d["sens_pools"], chans=d["crnn_chans"],
                         n_primal=d["n_primal"])

    def test_protocol_shape_is_reference_scale(self):
        # 15 temporal slices x 10 coils x 200x200 crop (mri_data.py:272-277)
        assert PROTOCOL_SHAPE == (15, 10, 200, 200)
