"""TSDF fusion: a fronto-parallel plane fuses to a planar zero-crossing."""

import jax.numpy as jnp
import numpy as np

from sage_slam_tpu.eval import tsdf
from sage_slam_tpu.geometry.camera import PinholeCamera
from sage_slam_tpu.geometry.se3 import SE3


def test_plane_fusion():
    h, w = 32, 40
    cam = PinholeCamera(fx=40.0, fy=40.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h)
    depth = jnp.full((h, w), 1.0)
    mask = jnp.ones((h, w))
    vol = tsdf.TSDFVolume.create(
        origin=(-0.5, -0.5, 0.0), dims=(32, 32, 32), voxel_size=0.05
    )
    vol = tsdf.integrate(vol, depth, mask, SE3.identity(), cam)
    t = np.array(vol.tsdf)
    wgt = np.array(vol.weight)
    assert wgt.sum() > 0
    # zero-crossing near z = 1.0 (voxel index z=20: origin 0 + 20*0.05)
    zc = t[16, 16, :]
    observed = wgt[16, 16, :] > 0
    assert observed.any()
    # in front of the surface (z<1): positive; behind: negative (within trunc)
    assert zc[observed & (np.arange(32) * 0.05 < 0.9)].min() > 0.5
    near = np.abs(np.arange(32) * 0.05 - 1.0) < 0.05
    assert np.abs(zc[near & observed]).max() < 0.5


def test_extract_and_save(tmp_path):
    import os

    h, w = 16, 20
    cam = PinholeCamera(fx=20.0, fy=20.0, cx=w / 2, cy=h / 2, width=w, height=h)
    vol = tsdf.TSDFVolume.create((-0.5, -0.5, 0.0), (16, 16, 16), 0.08)
    vol = tsdf.integrate(
        vol, jnp.full((h, w), 0.7), jnp.ones((h, w)), SE3.identity(), cam
    )
    pts = tsdf.extract_points(vol)
    assert len(pts) > 0
    path = os.path.join(tmp_path, "mesh.ply")
    tsdf.save_ply(path, pts)
    assert os.path.getsize(path) > 100


def test_marching_tetrahedra_plane(tmp_path):
    """The fused fronto-parallel plane extracts to a mesh whose vertices
    lie near z = depth and whose face normals point along z."""
    import os

    h, w = 32, 40
    cam = PinholeCamera(
        fx=40.0, fy=40.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    vol = tsdf.TSDFVolume.create(
        origin=(-0.5, -0.5, 0.0), dims=(32, 32, 32), voxel_size=0.05
    )
    vol = tsdf.integrate(
        vol, jnp.full((h, w), 1.0), jnp.ones((h, w)), SE3.identity(), cam
    )
    verts, faces = tsdf.marching_tetrahedra(vol)
    assert len(verts) > 50
    assert len(faces) > 50
    assert faces.max() < len(verts)
    # all vertices near the z=1 plane
    assert np.abs(verts[:, 2] - 1.0).max() < 0.15
    # faces are mostly z-normal
    n = tsdf.face_normals(verts, faces)
    assert np.abs(n[:, 2]).mean() > 0.9

    # mesh PLY roundtrip: header declares faces
    path = os.path.join(tmp_path, "mesh.ply")
    tsdf.save_ply(path, verts, faces)
    head = open(path).read(400)
    assert "element face" in head
    assert "vertex_indices" in head


def test_fly_through_renders_frames():
    h, w = 24, 30
    cam = PinholeCamera(
        fx=30.0, fy=30.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    vol = tsdf.TSDFVolume.create((-0.5, -0.5, 0.0), (24, 24, 24), 0.07)
    vol = tsdf.integrate(
        vol, jnp.full((h, w), 0.9), jnp.ones((h, w)), SE3.identity(), cam
    )
    poses = [SE3.identity(), SE3(jnp.eye(3), jnp.asarray([0.1, 0.0, -0.1]))]
    frames = tsdf.fly_through(vol, cam, poses, num_frames=4)
    assert len(frames) == 4
    for fr in frames:
        assert fr.shape == (h, w, 3) and fr.dtype == np.uint8
    # the surface is visible: some lit pixels in every frame
    assert all(int((fr > 0).sum()) > 20 for fr in frames)


def test_tfidf_vocabulary_weights():
    """TF-IDF weighting: a word present in every document gets weight 0
    (log 1); rarer words get higher weights (tensor_vocabulary.cpp:48-128
    semantics)."""
    from sage_slam_tpu.loop import vocabulary

    rng = np.random.default_rng(0)
    # 3 clusters; cluster 0 appears in all docs, cluster 1 in half,
    # cluster 2 in one doc
    c0 = rng.normal(0, 0.05, (200, 8)) + np.r_[[1.0] + [0.0] * 7]
    c1 = rng.normal(0, 0.05, (100, 8)) + np.r_[[0.0, 1.0] + [0.0] * 6]
    c2 = rng.normal(0, 0.05, (50, 8)) + np.r_[[0.0, 0.0, 1.0] + [0.0] * 5]
    feats, docs = [], []
    for d in range(4):
        feats.append(c0[d * 50 : (d + 1) * 50])
        docs.append(np.full(50, d))
        if d < 2:
            feats.append(c1[d * 50 : (d + 1) * 50])
            docs.append(np.full(50, d))
        if d == 0:
            feats.append(c2)
            docs.append(np.full(50, d))
    features = np.concatenate(feats).astype(np.float32)
    doc_ids = np.concatenate(docs)
    voc = vocabulary.build_vocabulary(
        features, k=3, levels=1, doc_ids=doc_ids, seed=0
    )
    wid = np.array(vocabulary.descend_to_words(voc, features))
    w = np.array(voc.weights)
    word_w = np.zeros(voc.num_words)
    word_nodes = np.array(voc.word_ids)
    for nid in np.flatnonzero(word_nodes >= 0):
        word_w[word_nodes[nid]] = w[nid]
    # idf of the everywhere-word is log(4/4)=0; half-word log(2);
    # rare word log(4)
    # layout: doc0 = [c0 0:50 | c1 50:100 | c2 100:150], doc1 starts at 150
    w_c0 = word_w[wid[0]]
    w_c1 = word_w[wid[50]]
    w_c2 = word_w[wid[100]]
    assert w_c0 == 0.0
    assert abs(w_c1 - np.log(2.0)) < 1e-5
    assert abs(w_c2 - np.log(4.0)) < 1e-5


def test_warp_display(tmp_path):
    """Identity warp reproduces the frame content where valid."""
    import jax.numpy as jnp
    import os

    from sage_slam_tpu.viz import warp_display

    h, w = 16, 20
    cam = PinholeCamera(fx=20.0, fy=20.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, h * w)).astype(np.float32)
    depth = jnp.full((h * w,), 1.0)
    mask = jnp.ones((h * w,))
    warped, valid = warp_display.se3_warp_image(
        jnp.asarray(img), depth, mask, np.eye(3, dtype=np.float32),
        np.zeros(3, np.float32), cam,
    )
    assert valid.min() > 0.5
    np.testing.assert_allclose(
        warped.reshape(3, -1), img, atol=1e-4
    )
    cb = warp_display.checkerboard(h, w)
    assert cb.shape == (h, w) and set(np.unique(cb)) == {0.0, 1.0}
