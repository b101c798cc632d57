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
