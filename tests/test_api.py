"""Top-level API surface + helper_functions compat shim."""


def test_lazy_top_level_api():
    import disentangle_mlp_tpu as dmt

    assert dmt.Config().n_hidden == 128
    assert callable(dmt.run_vaegan)
    assert callable(dmt.get_fid)
    assert callable(dmt.get_data_loader)
    assert set(dmt.RUNNERS) == {"vae", "gan", "betavaegan", "vaegan"}


def test_helper_functions_shim(tmp_path):
    """The reference's `from helper_functions import *` pattern keeps
    working, including with fake fn/loader (utils/utils.py:35-57 style)."""
    import numpy as np
    from disentangle_mlp_tpu.helper_functions import (
        gen_reconstructions, generate_fid_samples, generate_samples)

    fake = lambda z: np.zeros((np.asarray(z).shape[0], 8, 8, 3), np.float32)
    generate_fid_samples(fake, 3, 2, 16, str(tmp_path))
    assert (tmp_path / "sample_0_3.png").exists()
    assert (tmp_path / "sample_1_3.png").exists()
    generate_samples(fake, 4, 2, 16, str(tmp_path))
    assert (tmp_path / "sample_4.png").exists()
    dl = [(np.zeros((2, 8, 8, 3), np.float32), 1)]
    gen_reconstructions(lambda x: x, dl, 5, str(tmp_path),
                        path_for_originals=str(tmp_path))
    assert (tmp_path / "recon_5.png").exists()
    assert (tmp_path / "original_5.png").exists()
