"""Reference-code-in-the-loop oracles: pooling/pasting/decode/sampler glue.

Round-5 extension of the oracle suite (tests/_reference_shim.py): imports the
ACTUAL reference leaf modules and pins the remaining host-side / routing
semantics that the detector families rest on but that earlier oracle files
did not cover:

  * assign_boxes_to_levels — the FPN level-routing formula
    (modeling/poolers.py:22-58 vs cddmsl_tpu/models/poolers.py:18)
  * add_ground_truth_to_proposals — append order + the P(object)~1 logit
    (proposal_generator/proposal_utils.py:133-196 vs
    cddmsl_tpu/models/roi_heads.py label_and_sample_proposals)
  * paste_masks_in_image — the exact grid_sample paste + >=threshold
    binarization (layers/mask_ops.py:74-137 vs evaluation/masks.py
    paste_masks_np, BOTH the C++ native kernel and the numpy mirror)
  * heatmaps_to_keypoints — bicubic-upsample keypoint decode
    (structures/keypoints.py:156-230 vs models/keypoint_head.py
    decode_keypoint_heatmaps; granularity bound documented there)
  * RepeatFactorTrainingSampler.repeat_factors_from_category_frequency —
    the LVIS rebalancing arithmetic (data/samplers/distributed_sampler.py:86
    vs cddmsl_tpu/data/build.py RepeatFactorTrainingSampler)
  * ImageList.from_tensors — divisibility round-up + top-left placement
    (structures/image_list.py:72-121 vs cddmsl_tpu/structures/image_list.py)
"""

import math
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))
from _reference_shim import build_ref_pkg  # noqa: E402


@pytest.fixture(scope="module")
def refmods():
    mods = build_ref_pkg()
    if mods is None:
        pytest.skip("reference tree not available")
    return mods


# ------------------------------------------------------------- FPN routing
def test_pooler_level_assignment_matches_reference(refmods, rng):
    from cddmsl_tpu.models.poolers import assign_boxes_to_levels

    Boxes = refmods.boxes.Boxes
    # areas spanning sub-canonical to way-above-canonical, plus degenerate
    wh = np.concatenate(
        [rng.uniform(1, 900, size=(64, 2)), np.array([[0.0, 0.0], [1e4, 1e4]])]
    )
    xy = rng.uniform(0, 100, size=(66, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)

    ref = refmods.poolers.assign_boxes_to_levels(
        [Boxes(torch.from_numpy(boxes[:33])), Boxes(torch.from_numpy(boxes[33:]))],
        min_level=2, max_level=5, canonical_box_size=224, canonical_level=4,
    ).numpy()
    ours = np.asarray(assign_boxes_to_levels(jnp.asarray(boxes), 2, 5, 224, 4))
    # ref returns the offset from min_level; ours the absolute level
    np.testing.assert_array_equal(ours - 2, ref)


# ------------------------------------------------- proposal GT augmentation
def test_add_gt_to_proposals_matches_reference(refmods, rng):
    """Reference appends GT boxes AFTER the proposals with an objectness
    logit of log((1-1e-10)/1e-10); our label_and_sample_proposals appends in
    the same order (roi_heads.py per_image: concatenate([pboxes, gtb]))."""
    Boxes, Instances = refmods.boxes.Boxes, refmods.instances.Instances
    props = rng.uniform(0, 60, size=(10, 4)).astype(np.float32)
    props[:, 2:] += props[:, :2]
    gt = rng.uniform(0, 60, size=(3, 4)).astype(np.float32)
    gt[:, 2:] += gt[:, :2] + 4.0

    inst = Instances((64, 64))
    inst.proposal_boxes = Boxes(torch.from_numpy(props))
    inst.objectness_logits = torch.from_numpy(rng.randn(10).astype(np.float32))
    out = refmods.proposal_utils.add_ground_truth_to_proposals(
        [Boxes(torch.from_numpy(gt))], [inst]
    )[0]

    # order: proposals first, GT appended at the tail
    np.testing.assert_array_equal(
        out.proposal_boxes.tensor.numpy(), np.concatenate([props, gt], axis=0)
    )
    want_logit = math.log((1.0 - 1e-10) / 1e-10)
    np.testing.assert_allclose(out.objectness_logits.numpy()[10:], want_logit, rtol=1e-6)

    # behavioral pin on our side: with every proposal invalid, append-GT means
    # the sampled foreground set is exactly the GT boxes (self-match, IoU 1)
    import jax

    from cddmsl_tpu.models.roi_heads import CLIPRes5ROIHeads

    heads = CLIPRes5ROIHeads(
        num_classes=5, batch_size_per_image=8, positive_fraction=1.0,
        proposal_append_gt=True,
    ).bind({})  # setup() only; label_and_sample_proposals is param-free
    from cddmsl_tpu.models.rpn import Proposals

    pboxes = jnp.zeros((1, 10, 4), jnp.float32)
    proposals = Proposals(
        boxes=pboxes,
        scores=jnp.zeros((1, 10), jnp.float32),
        valid=jnp.zeros((1, 10), bool),
    )
    gtb = jnp.asarray(gt)[None]
    gtc = jnp.asarray([[0, 2, 4]], jnp.int32)
    gtv = jnp.ones((1, 3), bool)
    sboxes, sclasses, _, svalid, _ = heads.label_and_sample_proposals(
        jax.random.PRNGKey(0), proposals, gtb, gtc, gtv
    )[:5]
    fg = np.asarray(svalid[0]) & (np.asarray(sclasses[0]) < 5)
    got = np.asarray(sboxes[0])[fg]
    # every sampled fg box is one of the appended GT boxes, and all 3 appear
    assert got.shape[0] >= 3
    for row in got:
        assert min(np.abs(gt - row).sum(axis=1)) < 1e-5
    for row in gt:
        assert min(np.abs(got - row).sum(axis=1)) < 1e-5


# ------------------------------------------------------------- mask pasting
def _paste_fixture(rng):
    m = 28
    masks = 1.0 / (1.0 + np.exp(-rng.randn(6, m, m).astype(np.float32) * 3.0))
    boxes = np.array(
        [
            [10.3, 12.7, 40.9, 50.1],   # interior, subpixel edges
            [-15.0, -8.0, 20.0, 30.0],  # hangs off top-left
            [60.0, 40.0, 110.0, 90.0],  # hangs off bottom-right
            [30.0, 30.0, 31.2, 31.4],   # tiny (~1px)
            [0.0, 0.0, 83.0, 61.0],     # full image
            [70.2, 20.5, 82.9, 45.0],   # tall sliver at right edge
        ],
        np.float64,
    )
    return masks, boxes, (61, 83)


def test_paste_masks_matches_reference_native(refmods, rng):
    from cddmsl_tpu.evaluation.masks import paste_masks_np

    masks, boxes, hw = _paste_fixture(rng)
    ref = refmods.mask_ops.paste_masks_in_image(
        torch.from_numpy(masks), torch.from_numpy(boxes).float(), hw, threshold=0.5
    ).numpy().astype(bool)
    ours = paste_masks_np(masks, boxes, hw, threshold=0.5)
    np.testing.assert_array_equal(ours, ref)


def test_paste_masks_matches_reference_numpy_mirror(refmods, rng, monkeypatch):
    import cddmsl_tpu.csrc.build as csrc_build
    from cddmsl_tpu.evaluation.masks import paste_masks_np

    monkeypatch.setattr(csrc_build, "load_native", lambda name: None)
    masks, boxes, hw = _paste_fixture(rng)
    ref = refmods.mask_ops.paste_masks_in_image(
        torch.from_numpy(masks), torch.from_numpy(boxes).float(), hw, threshold=0.5
    ).numpy().astype(bool)
    ours = paste_masks_np(masks, boxes, hw, threshold=0.5)
    np.testing.assert_array_equal(ours, ref)


# --------------------------------------------------------- keypoint decode
def test_keypoint_decode_matches_reference(refmods, rng):
    """Sharp-peak heatmaps: the reference's integer-pixel argmax on the
    bicubic-upsampled map and our static sub-bin lattice refinement must
    agree to ~1 heatmap-bin in pixels (each is a quantization of the same
    continuous bicubic surface; models/keypoint_head.py docstring)."""
    from cddmsl_tpu.models.keypoint_head import decode_keypoint_heatmaps

    n, k, s = 5, 4, 14
    heat = (rng.randn(n, k, s, s) * 0.3).astype(np.float32)
    peaks = rng.randint(2, s - 2, size=(n, k, 2))
    for i in range(n):
        for j in range(k):
            heat[i, j, peaks[i, j, 0], peaks[i, j, 1]] += 5.0
    rois = rng.uniform(5, 40, size=(n, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + rng.uniform(25, 70, size=(n, 2))

    ref = refmods.keypoints.heatmaps_to_keypoints(
        torch.from_numpy(heat), torch.from_numpy(rois)
    ).numpy()  # (n, k, 4): x, y, logit, score

    ours = np.asarray(
        decode_keypoint_heatmaps(
            jnp.asarray(np.transpose(heat, (0, 2, 3, 1))), jnp.asarray(rois)[None]
        )
    )[0]  # (n, k, 3): x, y, score

    w = (rois[:, 2] - rois[:, 0])[:, None]
    h = (rois[:, 3] - rois[:, 1])[:, None]
    # same coarse heatmap bin...
    np.testing.assert_array_equal(
        np.floor((ours[..., 0] - rois[:, 0:1]) / w * s).astype(int),
        np.clip(np.floor((ref[..., 0] - rois[:, 0:1]) / w * s), 0, s - 1).astype(int),
    )
    np.testing.assert_array_equal(
        np.floor((ours[..., 1] - rois[:, 1:2]) / h * s).astype(int),
        np.clip(np.floor((ref[..., 1] - rois[:, 1:2]) / h * s), 0, s - 1).astype(int),
    )
    # ...and sub-bin agreement within one upsampled pixel + our lattice step
    assert (np.abs(ours[..., 0] - ref[..., 0]) < w / s * 0.5 + 1.5).all()
    assert (np.abs(ours[..., 1] - ref[..., 1]) < h / s * 0.5 + 1.5).all()
    # scores: same pool-normalized softmax, but the reference evaluates its
    # numerator at the UPSAMPLED-grid argmax, which can sit up to half an
    # upsampled pixel off the raw bin peak (and bicubic over/undershoots) —
    # so the scores agree only up to that sampling error of the peak logit.
    # Pin the log-score gap to 1 logit; the peak contrast here is 5 logits.
    assert np.abs(np.log(ours[..., 2]) - np.log(ref[..., 3])).max() < 1.0


# ----------------------------------------------------------------- soft-NMS
@pytest.mark.parametrize("method", ["gaussian", "linear", "hard"])
def test_soft_nms_matches_reference_code(refmods, rng, method):
    """The ACTUAL reference layers/soft_nms.py (pure torch, imported whole)
    vs ops/soft_nms.py — upgrades test_soft_nms_parity.py's builder-written
    numpy oracle to reference code itself: same kept-index sequence, same
    decayed scores, for all three methods, plain and class-batched."""
    from cddmsl_tpu.ops.soft_nms import batched_soft_nms, soft_nms

    n = 40
    centers = rng.uniform(10, 90, size=(n // 4, 2)).repeat(4, axis=0)
    jitter = rng.uniform(-6, 6, size=(n, 2))
    wh = rng.uniform(8, 30, size=(n, 2))
    boxes = np.concatenate(
        [centers + jitter - wh / 2, centers + jitter + wh / 2], axis=1
    ).astype(np.float32)
    scores = rng.uniform(0.05, 1.0, size=n).astype(np.float32)
    classes = rng.randint(0, 3, size=n)

    want_idx, want_scores = refmods.soft_nms.soft_nms(
        torch.from_numpy(boxes), torch.from_numpy(scores), method, 0.5, 0.3, 0.001
    )
    idx, new_scores, valid = soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), method=method,
        gaussian_sigma=0.5, linear_threshold=0.3, prune_threshold=0.001, max_out=n,
    )
    got_idx = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got_idx, want_idx.numpy())
    np.testing.assert_allclose(
        np.asarray(new_scores)[np.asarray(valid)], want_scores.numpy(), rtol=2e-5, atol=1e-6
    )

    want_idx, want_scores = refmods.soft_nms.batched_soft_nms(
        torch.from_numpy(boxes), torch.from_numpy(scores),
        torch.from_numpy(classes), method, 0.5, 0.3, 0.001,
    )
    idx, new_scores, valid = batched_soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), method=method,
        gaussian_sigma=0.5, linear_threshold=0.3, prune_threshold=0.001, max_out=n,
    )
    got_idx = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got_idx, want_idx.numpy())
    np.testing.assert_allclose(
        np.asarray(new_scores)[np.asarray(valid)], want_scores.numpy(), rtol=2e-5, atol=1e-6
    )


# ------------------------------------------------- keypoint target encoding
def test_keypoint_encode_matches_reference(refmods, rng):
    """_keypoints_to_heatmap (structures/keypoints.py:96-152) vs our
    keypoints_to_heatmap_targets: identical flat-index targets and validity,
    including the x==x2/y==y2 boundary-bin override, out-of-roi and
    invisible keypoints."""
    from cddmsl_tpu.models.keypoint_head import KeypointROIHeads

    n, k, s = 8, 6, 56
    rois = rng.uniform(0, 50, size=(n, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + rng.uniform(10, 60, size=(n, 2))
    kps = np.zeros((n, k, 3), np.float32)
    # spread: interior, off-roi, negative coords
    kps[..., 0] = rng.uniform(-10, 120, size=(n, k))
    kps[..., 1] = rng.uniform(-10, 120, size=(n, k))
    kps[..., 2] = rng.randint(0, 3, size=(n, k))
    # exact right/bottom boundary hits (the reference's special case)
    kps[0, 0, :] = [rois[0, 2], rois[0, 3], 2]
    kps[1, 1, :] = [rois[1, 0], rois[1, 1], 1]  # exact top-left corner
    kps[2, 2, :] = [rois[2, 2], rois[2, 1], 0]  # boundary but invisible

    want_pos, want_valid = refmods.keypoints._keypoints_to_heatmap(
        torch.from_numpy(kps), torch.from_numpy(rois), s
    )
    pos, vis = KeypointROIHeads.keypoints_to_heatmap_targets(
        jnp.asarray(kps), jnp.asarray(rois), s
    )
    got_valid = np.asarray(vis).astype(np.int64)
    np.testing.assert_array_equal(got_valid, want_valid.numpy())
    # the reference zeroes target indices of invalid keypoints (lin_ind * valid)
    np.testing.assert_array_equal(
        np.asarray(pos) * got_valid, want_pos.numpy()
    )


# ------------------------------------------------------ LVIS repeat factors
def test_repeat_factors_match_reference(refmods, rng):
    from cddmsl_tpu.data.build import RepeatFactorTrainingSampler as OurSampler

    dicts = []
    for _ in range(60):
        cats = rng.choice(12, size=rng.randint(0, 4), replace=False)
        dicts.append({"annotations": [{"category_id": int(c)} for c in cats]})
    ref = refmods.distributed_sampler.RepeatFactorTrainingSampler
    want = ref.repeat_factors_from_category_frequency(dicts, repeat_thresh=0.3).numpy()
    ours = OurSampler(dicts, repeat_thresh=0.3)._rep
    np.testing.assert_allclose(ours, want, rtol=1e-6)


# -------------------------------------------------- detector_postprocess
def test_detector_postprocess_matches_reference(refmods, rng):
    """detector_postprocess (modeling/postprocessing.py:9-59): scale to the
    output resolution FIRST, then clip to it, then drop empty boxes — vs our
    inline rescale in models/rcnn.py inference (scale -> clip; empties are
    masked by validity rather than filtered)."""
    from cddmsl_tpu.structures import boxes as box_ops

    Boxes, Instances = refmods.boxes.Boxes, refmods.instances.Instances
    in_h, in_w, out_h, out_w = 480, 640, 720, 1080
    boxes = rng.uniform(0, 700, size=(12, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(-2, 200, size=(12, 2))  # some empty

    inst = Instances((in_h, in_w))
    inst.pred_boxes = Boxes(torch.from_numpy(boxes.copy()))
    inst.scores = torch.from_numpy(rng.rand(12).astype(np.float32))
    out = refmods.postprocessing.detector_postprocess(inst, out_h, out_w)

    sx, sy = out_w / in_w, out_h / in_h
    ours = np.asarray(
        box_ops.clip(
            jnp.asarray(boxes) * jnp.asarray([sx, sy, sx, sy]), (out_h, out_w)
        )
    )
    valid = (ours[:, 2] > ours[:, 0]) & (ours[:, 3] > ours[:, 1])
    np.testing.assert_allclose(ours[valid], out.pred_boxes.tensor.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(inst.scores)[valid], out.scores.numpy()
    )


# ------------------------------------------------------------ config surface
def test_config_surface_matches_reference(refmods):
    """The reference's ENTIRE config surface — executing the ACTUAL
    config/defaults.py + add_ateacher_config (config/config.py:13-58) with
    our CfgNode as data host — vs our get_cfg()+add_ateacher_config: every
    reference leaf key must exist in ours with an equal default, except the
    explicitly documented deltas below (each pinned on BOTH sides so any
    drift — theirs or ours — fails loudly)."""
    from cddmsl_tpu.config import add_ateacher_config, get_cfg

    DELTAS = {
        # TPU port substitutions
        "MODEL.DEVICE": ("cuda", "tpu"),
        # our flagship defaults bake the CDDMSL/CLIP architecture in; the
        # reference reaches it only through yaml (every recipe sets these)
        "MODEL.BACKBONE.NAME": ("build_resnet_backbone", "build_clip_resnet_backbone"),
        "MODEL.ROI_HEADS.NAME": ("Res5ROIHeads", "CLIPRes5ROIHeads"),
        "MODEL.CLIP.CROP_REGION_TYPE": ("", "RPN"),
        "MODEL.CLIP.OFFLINE_RPN_NMS_THRESH": (None, 0.9),
        # goldens pin behavior at effective seed 0 (engine uses max(SEED,0));
        # the reference's SEED=1 / data seed 1 are recipe-level choices
        "SEED": (1, -1),
        "DATALOADER.RANDOM_DATA_SEED": (1, 0),
        # trainer dispatch: our tools select MeanTeacherTrainer only when a
        # config opts in; EMA default matches the mt recipes instead of the
        # reference's inert 0.0 (config/ateacher.py notes)
        "SEMISUPNET.Trainer": ("ateacher", "default"),
        "SEMISUPNET.EMA_KEEP_RATE": (0.0, 0.9996),
    }

    ref = refmods.config_defaults._C.clone()
    refmods.config_config.add_ateacher_config(ref)
    ours = get_cfg()
    add_ateacher_config(ours)

    def leaves(c, pre=""):
        out = {}
        for k, v in c.items():
            if isinstance(v, dict):
                out.update(leaves(v, pre + k + "."))
            else:
                out[pre + k] = v
        return out

    def norm(v):
        if isinstance(v, (tuple, list)):
            return [norm(x) for x in v]
        return v

    R, O = leaves(ref), leaves(ours)
    missing = sorted(k for k in R if k not in O)
    assert not missing, f"reference config keys absent from ours: {missing}"
    for k, rv in R.items():
        if k in DELTAS:
            want_ref, want_ours = DELTAS[k]
            assert norm(rv) == norm(want_ref), (k, rv)
            assert norm(O[k]) == norm(want_ours), (k, O[k])
        else:
            assert norm(O[k]) == norm(rv), (k, rv, O[k])


# -------------------------------------------------------------- LR schedule
def test_lr_schedule_matches_reference(refmods):
    """The reference's torch WarmupMultiStepLR / WarmupCosineLR
    (solver/lr_scheduler.py:132-210, the schedulers behind every yaml
    recipe) stepped through a real torch optimizer vs our
    solver/build.py build_lr_schedule at every iteration — warmup ramp,
    milestone boundaries (incl. a milestone INSIDE warmup) and the cosine
    tail must agree exactly."""
    from cddmsl_tpu.config import get_cfg
    from cddmsl_tpu.solver.build import build_lr_schedule

    def torch_lrs(sched_cls, n, **kw):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=0.02)
        sched = sched_cls(opt, **kw)
        out = []
        for _ in range(n):
            out.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step()
        return np.asarray(out)

    n = 30
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 5
    cfg.SOLVER.WARMUP_FACTOR = 0.001
    cfg.SOLVER.STEPS = (3, 12, 16)  # 3 lands inside warmup
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.MAX_ITER = n
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"

    want = torch_lrs(
        refmods.lr_scheduler.WarmupMultiStepLR, n,
        milestones=[3, 12, 16], gamma=0.1, warmup_factor=0.001, warmup_iters=5,
    )
    ours = np.asarray([float(build_lr_schedule(cfg)(i)) for i in range(n)])
    np.testing.assert_allclose(ours, want, rtol=1e-6)

    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupCosineLR"
    want = torch_lrs(
        refmods.lr_scheduler.WarmupCosineLR, n,
        max_iters=n, warmup_factor=0.001, warmup_iters=5,
    )
    ours = np.asarray([float(build_lr_schedule(cfg)(i)) for i in range(n)])
    # our schedule evaluates jnp.cos in float32 on device; the reference is
    # float64 math.cos — rtol reflects f32 ulp, not a semantic difference
    np.testing.assert_allclose(ours, want, rtol=1e-5)


# ---------------------------------------------------------- image batching
def test_image_list_padding_matches_reference(refmods, rng):
    from cddmsl_tpu.structures.image_list import ImageList as OurImageList

    imgs = [rng.randn(3, 37, 51).astype(np.float32), rng.randn(3, 60, 22).astype(np.float32)]
    ref = refmods.image_list.ImageList.from_tensors(
        [torch.from_numpy(t) for t in imgs], size_divisibility=32
    )
    ours = OurImageList.from_tensors(
        [np.transpose(t, (1, 2, 0)) for t in imgs], size_divisibility=32
    )
    assert tuple(ref.tensor.shape[-2:]) == ours.padded_size == (64, 64)
    np.testing.assert_array_equal(
        np.transpose(ref.tensor.numpy(), (0, 2, 3, 1)), np.asarray(ours.tensor)
    )
    assert [tuple(s) for s in ref.image_sizes] == [tuple(s) for s in np.asarray(ours.image_sizes)]
