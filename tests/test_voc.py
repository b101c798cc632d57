import os

import numpy as np

from balancedgroupsoftmax_tpu.data.voc import VOCDataset


def make_voc(tmp_path):
    root = tmp_path / "VOC2007"
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "JPEGImages").mkdir()
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("000001\n000002\n")
    xml = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>48</xmin><ymin>240</ymin><xmax>195</xmax><ymax>371</ymax></bndbox>
  </object>
  <object><name>person</name><difficult>1</difficult>
    <bndbox><xmin>8</xmin><ymin>12</ymin><xmax>352</xmax><ymax>498</ymax></bndbox>
  </object>
</annotation>"""
    (root / "Annotations" / "000001.xml").write_text(xml.format(w=353, h=500))
    (root / "Annotations" / "000002.xml").write_text(
        xml.format(w=500, h=375).replace("dog", "cat")
    )
    return str(root)


def test_voc_dataset(tmp_path):
    root = make_voc(tmp_path)
    ds = VOCDataset(root, split="trainval")
    assert len(ds) == 2
    ann = ds.get_ann_info(0)
    # 1-based -> 0-based conversion
    np.testing.assert_allclose(ann["bboxes"][0], [47, 239, 194, 370])
    assert ann["labels"][0] == 12  # dog
    assert ann["bboxes_ignore"].shape == (1, 4)  # difficult person
    assert ds.image_path(0).endswith("JPEGImages/000001.jpg")
    ann2 = VOCDataset(root).get_ann_info(1)
    assert ann2["labels"][0] == 8  # cat


def test_wider_face_dataset(tmp_path):
    from balancedgroupsoftmax_tpu.data.voc import WIDERFaceDataset

    root = tmp_path / "WIDER"
    (root / "Annotations").mkdir(parents=True)
    xml = """<annotation>
  <folder>0--Parade</folder>
  <size><width>1024</width><height>768</height><depth>3</depth></size>
  <object><name>face</name><difficult>0</difficult>
    <bndbox><xmin>101</xmin><ymin>201</ymin><xmax>151</xmax><ymax>251</ymax></bndbox>
  </object>
</annotation>"""
    (root / "Annotations" / "img_1.xml").write_text(xml)
    ann_file = root / "train.txt"
    ann_file.write_text("img_1\n")

    ds = WIDERFaceDataset(str(root), str(ann_file))
    assert len(ds) == 1
    assert ds.image_path(0).endswith(os.path.join("0--Parade", "img_1.jpg"))
    assert ds.img_infos[0]["width"] == 1024
    ann = ds.get_ann_info(0)
    np.testing.assert_allclose(ann["bboxes"][0], [100, 200, 150, 250])
    assert ann["labels"][0] == 1


def test_cityscapes_dataset(tmp_path):
    """CityscapesDataset: COCO-schema reading with nested file paths kept
    intact (no LVIS '_'-splitting) and the canonical 8-class check
    (reference datasets/cityscapes.py)."""
    import json

    from balancedgroupsoftmax_tpu.data.cityscapes import CityscapesDataset

    names = ["person", "rider", "car", "truck", "bus", "train",
             "motorcycle", "bicycle"]
    ann = dict(
        images=[dict(id=1, file_name="frankfurt/frankfurt_000000_000294.png",
                     width=2048, height=1024)],
        annotations=[dict(id=1, image_id=1, category_id=3,
                          bbox=[10.0, 20.0, 30.0, 40.0], area=1200.0,
                          iscrowd=0)],
        categories=[dict(id=i + 1, name=n) for i, n in enumerate(names)],
    )
    p = tmp_path / "cs.json"
    p.write_text(json.dumps(ann))
    ds = CityscapesDataset(str(p), str(tmp_path))
    assert ds.class_names == tuple(names)
    # nested relative path survives (LVIS would split it to 000294.png)
    assert ds.image_path(0).endswith(
        os.path.join("frankfurt", "frankfurt_000000_000294.png")
    )
    info = ds.get_ann_info(0)
    np.testing.assert_allclose(info["bboxes"][0], [10, 20, 39, 59])  # xywh->xyxy-1
    assert info["labels"][0] == 3

    ann["categories"] = ann["categories"][:4]
    p.write_text(json.dumps(ann))
    import pytest

    with pytest.raises(ValueError):
        CityscapesDataset(str(p), str(tmp_path))
