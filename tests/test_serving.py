"""AOT serving export: serialize the full predict program, reload it
without the model object, and match live inference exactly."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from objectdetection_3d_tpu import serving  # noqa: E402
from objectdetection_3d_tpu.models import PointPillars  # noqa: E402
from tiny import tiny_batch, tiny_model_cfg  # noqa: E402


@pytest.fixture(scope="module")
def exported_dir(tmp_path_factory):
    model = PointPillars(**tiny_model_cfg())
    variables = model.init_variables(jax.random.PRNGKey(0))
    payload, manifest = serving.export_predict(model, variables,
                                               batch_size=2)
    out = tmp_path_factory.mktemp("export")
    serving.save_exported(payload, manifest, str(out))
    return model, variables, str(out)


def test_roundtrip_matches_live_predict(exported_dir):
    model, variables, path = exported_dir
    serve, manifest = serving.load_serving(path)
    assert manifest["batch_size"] == 2
    assert manifest["inputs"]["points"][0] == [2, 2048, 4]

    raw = tiny_batch(batch_size=2, seed=5)
    batch = {"points": jnp.asarray(raw["points"]),
             "num_points": jnp.asarray(raw["num_points"])}
    got = serve(batch)
    want = model.predict(variables, {**batch})
    for k in ("bbox", "label", "score", "valid"):
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_exported_is_self_contained(exported_dir):
    """The artifact must be callable without the model/config objects —
    deserialization plus a batch dict is the whole serving contract."""
    _, _, path = exported_dir
    serve, manifest = serving.load_serving(path)
    b, p, c = manifest["inputs"]["points"][0]
    batch = {"points": jnp.zeros((b, p, c), jnp.float32),
             "num_points": jnp.zeros((b,), jnp.int32)}
    out = serve(batch)
    assert not bool(np.asarray(out["valid"]).any())  # empty clouds
