"""Reference .h5 checkpoint import: synthetic nnabla-style file -> pytree."""

import numpy as np
import pytest

from ndjir_tpu.config import load_config


def _write_reference_style_h5(path, params, prefix=""):
    """Flatten our pytree back into nnabla-scope-named h5 datasets."""
    import h5py

    def emit(f, tree, scope):
        for k, v in tree.items():
            if isinstance(v, dict):
                emit(f, v, scope + [k])
            else:
                if k in ("W", "b"):
                    name = "/".join(scope) + f"/affine/{k}"
                elif k == "g":
                    name = "/".join(scope) + "/affine/wn/g"
                elif k in ("F", "plane_F", "line_F"):
                    # grid params live under <family>_feature/F
                    gtype = scope[-1]  # "grid"
                    fam = {"F": FAMILY, "plane_F": "triplane_feature",
                           "line_F": "triline_feature"}[k]
                    name = "/".join(scope[:-1]) + f"/{fam}/F"
                else:  # gain
                    name = "/".join(scope) + f"/{k}"
                f.create_dataset(name, data=np.asarray(v))

    with h5py.File(path, "w") as f:
        emit(f, params, [])


FAMILY = "voxel_feature"


@pytest.mark.parametrize("gtype,family", [
    ("voxel", "voxel_feature"),
    ("voxel_hash", "voxel_hash_feature"),
])
def test_import_roundtrip(tmp_path, gtype, family):
    global FAMILY
    FAMILY = family
    import jax

    from ndjir_tpu.tools.import_reference import (
        convert_reference_params,
        load_reference_h5,
        validate_against_template,
    )
    from ndjir_tpu.models.fields import init_model

    conf = load_config("tiny_test", overrides=[
        f"geometric_network.voxel.type={gtype}",
        "geometric_network.voxel.hash_levels=4",
    ])
    template = init_model(jax.random.PRNGKey(3), conf)
    h5p = str(tmp_path / "model.h5")
    _write_reference_style_h5(h5p, template)

    flat = load_reference_h5(h5p)
    params, unmatched = convert_reference_params(flat, conf)
    assert not unmatched
    assert not validate_against_template(template, params)
    # exact value roundtrip on a few leaves
    np.testing.assert_array_equal(
        np.asarray(params["geometric-network"]["affine-00"]["W"]),
        np.asarray(template["geometric-network"]["affine-00"]["W"]))
    np.testing.assert_array_equal(
        np.asarray(params["geometric-network"]["grid"]["F"]),
        np.asarray(template["geometric-network"]["grid"]["F"]))
    np.testing.assert_array_equal(
        np.asarray(params["roughness-network"]["affine--1"]["b"]),
        np.asarray(template["roughness-network"]["affine--1"]["b"]))
    # nested background sub-networks survive
    assert "lighting-network" in params["background-network"]


def test_import_skips_schedule_params(tmp_path):
    import h5py

    from ndjir_tpu.tools.import_reference import (
        convert_reference_params,
        load_reference_h5,
    )

    conf = load_config("tiny_test")
    h5p = str(tmp_path / "m.h5")
    with h5py.File(h5p, "w") as f:
        f.create_dataset("cos_anneal_ratio", data=np.zeros(1))
        f.create_dataset("photogrammetric-light-network/gain",
                         data=np.ones(1))
        f.create_dataset("geometric-network/gain", data=np.asarray([0.3]))
    params, unmatched = convert_reference_params(load_reference_h5(h5p), conf)
    assert not unmatched
    assert "photogrammetric-light-network" not in params
    assert abs(float(params["geometric-network"]["gain"][0]) - 0.3) < 1e-6


def test_reference_style_roughness_head_names(tmp_path):
    """The reference names roughness/specular hidden layers affine-{l-1} but
    the LAST layer affine-{L-1} (gap in the sequence, network.py:451-454);
    the import map must accept exactly those names."""
    import h5py
    import jax

    from ndjir_tpu.models.fields import init_model
    from ndjir_tpu.tools.import_reference import (
        convert_reference_params,
        load_reference_h5,
        validate_against_template,
    )

    conf = load_config("tiny_test")   # roughness layers = 2
    template = init_model(jax.random.PRNGKey(0), conf)
    L = conf.roughness_network.layers
    # reference-style names for L=2: hidden affine--1, last affine-01
    assert f"affine-{L - 1:02d}" in template["roughness-network"]
    assert "affine--1" in template["roughness-network"]
    assert f"affine-{L - 2:02d}" not in template["roughness-network"] or L <= 2

    h5p = str(tmp_path / "rough.h5")
    with h5py.File(h5p, "w") as f:
        for lname, p in template["roughness-network"].items():
            for k in ("W", "b"):
                f.create_dataset(f"roughness-network/{lname}/affine/{k}",
                                 data=np.asarray(p[k]))
    params, unmatched = convert_reference_params(load_reference_h5(h5p), conf)
    assert not unmatched
    probs = validate_against_template(
        {"roughness-network": template["roughness-network"]}, params)
    assert not probs, probs


# ---------------------------------------------------------------------------
# Vendored scope-name fixture (VERDICT round-1 task 9)
# ---------------------------------------------------------------------------
# The exact parameter names nn.save_parameters writes for the DEFAULT config,
# transcribed from the reference source (NOT generated by our own importer,
# so naming drift fails loudly):
#   - per-layer scopes "affine-XX/affine/{W,b}" (reference network.py:88-93)
#   - geometric layers affine-00..06 + "affine-last" (network.py:196-225)
#   - roughness/specular hidden layers numbered l-1 => "affine--1" first,
#     with a gap before the last "affine-03" (network.py:451-454, 495-499)
#   - grid features under "<family>_feature/F" via parametric_function_api
#     (voxel_feature.py:144-160)
#   - learnable scalar "geometric-network/gain" (network.py:227-231)
#   - nested background sub-scopes (network.py:535, 548)
#   - non-learned schedule params "cos_anneal_ratio" and
#     "photogrammetric-light-network/gain" must be SKIPPED by the importer
#     (solver.py:100-119 pushes them; they are plain args here).

def _affines(scope, names):
    out = []
    for n in names:
        out += [f"{scope}/{n}/affine/W", f"{scope}/{n}/affine/b"]
    return out


REFERENCE_DEFAULT_H5_KEYS = (
    _affines("geometric-network",
             [f"affine-{l:02d}" for l in range(7)] + ["affine-last"])
    + ["geometric-network/gain", "geometric-network/voxel_feature/F"]
    + _affines("base-color-network", [f"affine-{l:02d}" for l in range(4)])
    + _affines("environment-light-network",
               [f"affine-{l:02d}" for l in range(4)])
    + _affines("implicit-illumination-network",
               [f"affine-{l:02d}" for l in range(4)])
    + _affines("soft-visibility-light-network",
               [f"affine-{l:02d}" for l in range(4)])
    + _affines("photogrammetric-light-network",
               [f"affine-{l:02d}" for l in range(4)])
    + _affines("roughness-network", ["affine--1", "affine-00", "affine-01",
                                     "affine-03"])
    + _affines("specular-reflectance-network",
               ["affine--1", "affine-00", "affine-01", "affine-03"])
    + _affines("background-network/geometric-network",
               [f"affine-{l:02d}" for l in range(4)])
    + _affines("background-network/lighting-network",
               ["affine-00", "affine-01"])
)

REFERENCE_SKIPPED_KEYS = ["cos_anneal_ratio",
                          "photogrammetric-light-network/gain"]


def test_reference_default_scope_names_map_completely():
    """Every name the reference writes for the default config must map onto
    a leaf of our init_model pytree, and vice versa (no silent drift)."""
    import jax

    from ndjir_tpu.models.fields import init_model
    from ndjir_tpu.tools.import_reference import (
        convert_reference_params,
        validate_against_template,
    )

    conf = load_config("default", overrides=[
        "geometric_network.voxel.grid_size=16"])
    template = init_model(jax.random.PRNGKey(0), conf)
    n_template_leaves = len(jax.tree_util.tree_leaves(template))
    assert len(REFERENCE_DEFAULT_H5_KEYS) == n_template_leaves

    # build a flat "h5" whose values don't matter structurally
    flat = {k: np.zeros((1,), np.float32) for k in REFERENCE_DEFAULT_H5_KEYS}
    for k in REFERENCE_SKIPPED_KEYS:
        flat[k] = np.zeros((1,), np.float32)
    params, unmatched = convert_reference_params(flat, conf)
    assert unmatched == []
    assert "cos_anneal_ratio" not in params
    assert "gain" not in params.get("photogrammetric-light-network", {})

    # every template path exists in the converted tree (ignore shapes here —
    # the roundtrip test below covers values/shapes)
    problems = [p for p in validate_against_template(params, template)
                if p.startswith("missing")]
    assert problems == [], problems

    # and nothing extra was invented
    n_conv = len(jax.tree_util.tree_leaves(params))
    assert n_conv == n_template_leaves
