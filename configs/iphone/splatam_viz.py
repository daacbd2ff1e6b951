"""iPhone reconstruction visualization config (reference
configs/iphone/splatam_viz.py): just the checkpoint path + viz options for
viz_scripts/{final_recon,online_recon}. Scene via IPHONE_SCENE env var."""
import os

scene_name = os.environ.get("IPHONE_SCENE", "offline_demo")
_run_dir = os.path.join("./experiments/iPhone_Captures", scene_name)

config = dict(
    workdir="./experiments/iPhone_Captures",
    run_name=scene_name,
    scene_path=os.path.join(_run_dir, "params.npz"),
    viz=dict(render_mode="color", offset_first_viz_cam=True,
             show_sil=False, visualize_cams=True, viz_w=600, viz_h=340,
             viz_near=0.01, viz_far=100.0, view_scale=2, viz_fps=5,
             enter_interactive_post_online=True),
)
