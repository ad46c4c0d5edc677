"""Props / operators / panel (reference: blender/interface.py:12-126).

Property set mirrors the reference's `StarsterProps` (interface.py:12-56):
model path, image directory, resolution (default 224), import-as enum,
dupli size, make-material toggle — plus the external python/CLI fields this
add-on needs for its subprocess design.
"""

import os
import subprocess
import tempfile

import bpy

from . import importer


class StarsterProps(bpy.types.PropertyGroup):
    python_path: bpy.props.StringProperty(
        name="Python", subtype="FILE_PATH", default="python3",
        description="External python with starst3r-tpu installed")
    model_path: bpy.props.StringProperty(
        name="Model", subtype="FILE_PATH", default="",
        description="Model checkpoint (.npz); empty = random tiny (debug)")
    preset: bpy.props.EnumProperty(
        name="Preset", items=[(p, p, "") for p in
                              ("tiny", "small", "base", "large")],
        default="tiny")
    directory: bpy.props.StringProperty(
        name="Images", subtype="DIR_PATH", default="",
        description="Directory of jpg/png input images")
    resolution: bpy.props.IntProperty(
        name="Resolution", default=224, min=32,
        description="Longest-edge working resolution "
                    "(reference default 224)")
    import_as: bpy.props.EnumProperty(
        name="Import as",
        items=[("VERTS", "Vertices", "One mesh vertex per point"),
               ("DUPLI", "DupliVerts", "Tetrahedron per point"),
               ("POINT_CLOUD", "Point cloud", "Vertices + point-cloud "
                "viewport display")],
        default="VERTS")
    dupli_size: bpy.props.FloatProperty(
        name="Dupli size", default=0.003, min=1e-5)
    make_material: bpy.props.BoolProperty(name="Make material", default=True)


class STARSTER_OT_ReconstructConfirm(bpy.types.Operator):
    """Confirmation dialog before the (long) reconstruction
    (reference interface.py:59-76)."""

    bl_idname = "starster.reconstruct_confirm"
    bl_label = "Reconstruct scene?"

    def invoke(self, context, event):
        return context.window_manager.invoke_props_dialog(self)

    def draw(self, context):
        self.layout.label(
            text="Runs reconstruction in a background process; "
                 "may take a few minutes.")

    def execute(self, context):
        return bpy.ops.starster.reconstruct()


class STARSTER_OT_Reconstruct(bpy.types.Operator):
    """Run the CLI and import the result (reference interface.py:79-100)."""

    bl_idname = "starster.reconstruct"
    bl_label = "Starst3r reconstruct"

    def execute(self, context):
        props = context.scene.starster
        err = self._verify(props)
        if err:
            self.report({"ERROR"}, err)
            return {"CANCELLED"}
        out = tempfile.mkdtemp(prefix="starster_blender_")
        cmd = [bpy.path.abspath(props.python_path), "-m", "starst3r_tpu",
               "reconstruct",
               "--imgdir", bpy.path.abspath(props.directory),
               "--out", out,
               "--res", str(props.resolution),
               "--preset", props.preset]
        if props.model_path:
            cmd += ["--model", bpy.path.abspath(props.model_path)]
        try:
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=3600)
        except Exception as e:  # noqa: BLE001
            self.report({"ERROR"}, f"failed to launch CLI: {e}")
            return {"CANCELLED"}
        if res.returncode != 0:
            self.report({"ERROR"},
                        f"reconstruction failed: {res.stderr[-400:]}")
            return {"CANCELLED"}
        importer.import_result(out, props)
        self.report({"INFO"}, f"imported reconstruction from {out}")
        return {"FINISHED"}

    @staticmethod
    def _verify(props):
        d = bpy.path.abspath(props.directory)
        if not d or not os.path.isdir(d):
            return "image directory does not exist"
        imgs = [f for f in os.listdir(d)
                if f.lower().endswith((".jpg", ".jpeg", ".png"))]
        if len(imgs) < 2:
            return "need at least two jpg/png images"
        if props.model_path and not os.path.isfile(
                bpy.path.abspath(props.model_path)):
            return "model checkpoint not found"
        return None


class STARSTER_PT_Panel(bpy.types.Panel):
    """N-panel (reference interface.py:103-126)."""

    bl_idname = "STARSTER_PT_Panel"
    bl_label = "Starst3r"
    bl_space_type = "VIEW_3D"
    bl_region_type = "UI"
    bl_category = "Starst3r"

    def draw(self, context):
        layout = self.layout
        props = context.scene.starster
        for name in ("python_path", "model_path", "preset", "directory",
                     "resolution", "import_as", "dupli_size",
                     "make_material"):
            layout.prop(props, name)
        layout.operator("starster.reconstruct_confirm", text="Reconstruct")


_CLASSES = (StarsterProps, STARSTER_OT_ReconstructConfirm,
            STARSTER_OT_Reconstruct, STARSTER_PT_Panel)


def register():
    for c in _CLASSES:
        bpy.utils.register_class(c)
    bpy.types.Scene.starster = bpy.props.PointerProperty(type=StarsterProps)


def unregister():
    del bpy.types.Scene.starster
    for c in reversed(_CLASSES):
        bpy.utils.unregister_class(c)
