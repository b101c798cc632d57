"""End-to-end CLI smoke tests on a synthetic mini-LVIS dataset.

Exercises the real user workflow — gs_partition -> train (2 steps, both
phases' flags) -> test_lvis (inference + federated eval) — through the
actual CLI entry points, on CPU. The dataset is tiny random images with
box annotations in genuine LVIS JSON format.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mini_lvis(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("mini_lvis")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)

    num_classes = 8
    cats = [
        dict(
            id=i + 1,
            name=f"cls{i + 1}",
            instance_count=int(10 ** (1 + i % 4)),
            frequency=["r", "c", "f", "f"][i % 4],
            image_count=int(5 * 10 ** (i % 3)),
        )
        for i in range(num_classes)
    ]
    images, annotations = [], []
    aid = 1
    for i in range(6):
        h, w = 120, 160
        fname = f"COCO_val2014_{i:012d}.jpg"
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / fname), img)
        images.append(
            dict(
                id=i + 1, file_name=fname, width=w, height=h,
                neg_category_ids=[], not_exhaustive_category_ids=[],
            )
        )
        for _ in range(3):
            bw, bh = (int(v) for v in rng.randint(20, 60, 2))
            x = int(rng.randint(0, w - bw))
            y = int(rng.randint(0, h - bh))
            annotations.append(
                dict(
                    id=aid, image_id=i + 1,
                    category_id=int(rng.randint(1, num_classes + 1)),
                    bbox=[float(x), float(y), float(bw), float(bh)],
                    area=float(bw * bh),
                    segmentation=[[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
                )
            )
            aid += 1
    ann = dict(images=images, annotations=annotations, categories=cats)
    ann_file = root / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return dict(root=root, ann=str(ann_file), img_prefix=str(img_dir))


def run_cli(args, cwd=REPO, timeout=1200):
    env = dict(os.environ)
    # JAX_PLATFORMS gets rewritten to the TPU backend by the image's
    # sitecustomize inside the child; BAGS_PLATFORM is applied via
    # jax.config by the CLIs and actually sticks
    env["JAX_PLATFORMS"] = "cpu"
    env["BAGS_PLATFORM"] = "cpu"
    env["BAGS_FORCE_XLA"] = "1"
    env["PYTHONPATH"] = REPO
    # tiny model via env override is not supported; rely on small image count
    r = subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"{args}\nSTDOUT:\n{r.stdout[-3000:]}\nSTDERR:\n{r.stderr[-3000:]}"
    return r.stdout


def test_gs_partition_cli(mini_lvis, tmp_path):
    out = str(tmp_path / "part.npz")
    stdout = run_cli(
        ["tools/gs_partition.py", "--ann", mini_lvis["ann"], "--out", out,
         "--num-classes", "9"]
    )
    assert "5 bins" in stdout
    assert os.path.exists(out)

    from balancedgroupsoftmax_tpu.gs.partition import load_partition

    p = load_partition(out)
    assert p.num_classes == 9


@pytest.mark.slow
def test_two_phase_bags_workflow(mini_lvis, tmp_path):
    """Phase 1 baseline -> phase 2 GS fine-tune with non-strict warm start
    (the reference's load_from + selectp=1 recipe, bg8.py:193,198)."""
    part = str(tmp_path / "part.npz")
    run_cli(
        ["tools/gs_partition.py", "--ann", mini_lvis["ann"], "--out", part,
         "--num-classes", "9"]
    )
    base = str(tmp_path / "base")
    run_cli(
        [
            "tools/train.py", "--model", "faster_rcnn_r50",
            "--ann", mini_lvis["ann"], "--img-prefix", mini_lvis["img_prefix"],
            "--work-dir", base, "--batch-size", "2", "--epochs", "1",
            "--max-steps", "1", "--log-interval", "1",
        ],
        timeout=2400,
    )
    bags = str(tmp_path / "bags")
    stdout = run_cli(
        [
            "tools/train.py", "--model", "gs_faster_rcnn_r50",
            "--ann", mini_lvis["ann"], "--img-prefix", mini_lvis["img_prefix"],
            "--partition", part, "--work-dir", bags,
            "--load-from", os.path.join(base, "ckpt_epoch_1"),
            "--selectp", "1", "--batch-size", "2", "--epochs", "1",
            "--max-steps", "1", "--log-interval", "1",
        ],
        timeout=2400,
    )
    # warm start must copy the shared trunk and leave the widened fc_cls fresh
    assert "warm start" in stdout
    assert "fresh" in stdout
    assert "loss_cls_bin0" in stdout


@pytest.mark.slow
def test_train_and_eval_cli(mini_lvis, tmp_path):
    part = str(tmp_path / "part.npz")
    run_cli(
        ["tools/gs_partition.py", "--ann", mini_lvis["ann"], "--out", part,
         "--num-classes", "9"]
    )
    work = str(tmp_path / "work")
    # NOTE: full-size model on CPU — keep to 1 step, 1 epoch
    stdout = run_cli(
        [
            "tools/train.py", "--model", "gs_faster_rcnn_r50",
            "--ann", mini_lvis["ann"], "--img-prefix", mini_lvis["img_prefix"],
            "--partition", part, "--work-dir", work,
            "--batch-size", "2", "--epochs", "1", "--max-steps", "1",
            "--log-interval", "1", "--selectp", "1",
        ],
        timeout=2400,
    )
    ckpts = [f for f in os.listdir(work) if f.startswith("ckpt_epoch")]
    assert ckpts, stdout[-2000:]

    stdout = run_cli(
        [
            "tools/test_lvis.py", "--model", "gs_faster_rcnn_r50",
            "--ann", mini_lvis["ann"], "--img-prefix", mini_lvis["img_prefix"],
            "--partition", part,
            "--checkpoint", os.path.join(work, ckpts[0]),
            "--out", str(tmp_path / "res.json"),
            "--batch-size", "2", "--limit", "4",
        ],
        timeout=2400,
    )
    assert "AP" in stdout or "| (AP)" in stdout
    assert os.path.exists(tmp_path / "res.json")

    # shared-proposal aug-test path (reference aug_test_bboxes flow); a
    # single view still drives propose -> merge_aug_proposals -> rescore
    # -> merge_aug_bboxes -> final NMS end to end
    stdout = run_cli(
        [
            "tools/test_lvis.py", "--model", "gs_faster_rcnn_r50",
            "--ann", mini_lvis["ann"], "--img-prefix", mini_lvis["img_prefix"],
            "--partition", part,
            "--checkpoint", os.path.join(work, ckpts[0]),
            "--out", str(tmp_path / "res_rescore.json"),
            "--batch-size", "2", "--limit", "2", "--aug-rescore",
        ],
        timeout=2400,
    )
    assert "AP" in stdout or "| (AP)" in stdout
    assert os.path.exists(tmp_path / "res_rescore.json")


def test_dataset_surgery_merge_coco(mini_lvis, tmp_path):
    coco = dict(
        images=[
            dict(id=900, file_name="COCO_val2014_000000000000.jpg",
                 width=160, height=120),
            dict(id=901, file_name="coco_only.jpg", width=100, height=100),
        ],
        annotations=[
            dict(id=1, image_id=900, category_id=7, bbox=[1, 1, 20, 20],
                 area=400, iscrowd=0),
            dict(id=2, image_id=901, category_id=7, bbox=[5, 5, 30, 30],
                 area=900, iscrowd=0),
            dict(id=3, image_id=901, category_id=8, bbox=[2, 2, 10, 10],
                 area=100, iscrowd=0),
        ],
        categories=[dict(id=7, name="CLS2"), dict(id=8, name="zebra")],
    )
    coco_file = tmp_path / "coco.json"
    coco_file.write_text(json.dumps(coco))
    out = tmp_path / "merged.json"
    log = run_cli([
        "tools/dataset_surgery.py", "merge-coco", "--ann", mini_lvis["ann"],
        "--coco-ann", str(coco_file), "--out", str(out),
    ])
    assert "matched 1/2" in log and "zebra" in log and "1 shared images" in log
    merged = json.loads(out.read_text())
    # 6 lvis images + 1 new coco image; 18 lvis anns + 2 matched coco anns
    assert len(merged["images"]) == 7
    assert len(merged["annotations"]) == 20
    # category ids untouched; CLS2 matched case-insensitively onto cls2 (id 2)
    assert {c["id"] for c in merged["categories"]} == set(range(1, 9))
    new_anns = [a for a in merged["annotations"] if a["id"] > 18]
    assert all(a["category_id"] == 2 for a in new_anns)
    # counts recomputed on merge
    c2 = next(c for c in merged["categories"] if c["id"] == 2)
    base = json.loads(open(mini_lvis["ann"]).read())
    base_c2 = sum(a["category_id"] == 2 for a in base["annotations"])
    assert c2["instance_count"] == base_c2 + 2


@pytest.mark.slow
def test_cascade_aug_rescore_cli(mini_lvis, tmp_path):
    """Cascade family through the shared-proposal TTA CLI path: train one
    step of cascade_rcnn_r50, then --aug-rescore inference (the round-1
    gap where propose/rescore existed only on FasterRCNN and any cascade
    model crashed the aug path at runtime)."""
    work = str(tmp_path / "casc")
    run_cli(
        [
            "tools/train.py", "--model", "cascade_rcnn_r50",
            "--ann", mini_lvis["ann"], "--img-prefix", mini_lvis["img_prefix"],
            "--work-dir", work, "--batch-size", "2", "--epochs", "1",
            "--max-steps", "1", "--log-interval", "1",
        ],
        timeout=2400,
    )
    ckpts = [f for f in os.listdir(work) if f.startswith("ckpt_epoch")]
    assert ckpts
    stdout = run_cli(
        [
            "tools/test_lvis.py", "--model", "cascade_rcnn_r50",
            "--ann", mini_lvis["ann"], "--img-prefix", mini_lvis["img_prefix"],
            "--checkpoint", os.path.join(work, ckpts[0]),
            "--out", str(tmp_path / "res_casc.json"),
            "--batch-size", "2", "--limit", "2", "--aug-rescore",
        ],
        timeout=2400,
    )
    assert "AP" in stdout or "| (AP)" in stdout
    assert os.path.exists(tmp_path / "res_casc.json")
