"""Replica post-SLAM optimization config (reference
configs/replica/post_splatam_opt.py): 15k-iteration multi-view refinement
of a finished room0 SLAM map with GS densification, trained on a strided
100-frame subset and evaluated on a denser 400-frame one."""
config = dict(
    workdir="./experiments/Replica",
    run_name="Post_SplaTAM_Opt",
    seed=0,
    primary_device="tpu",
    scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    report_iter_progress=False,
    use_wandb=False,
    eval_every=5,
    checkpoint_time_idx=-1,
    data=dict(
        basedir="./data/Replica",
        gradslam_data_cfg="./configs/data/replica.yaml",
        sequence="room0",
        desired_image_height=680, desired_image_width=1200,
        start=0, end=-1, stride=20, num_frames=100,
        eval_stride=5, eval_num_frames=400,
        param_ckpt_path="./experiments/Replica/room0_0/params.npz",
    ),
    train=dict(
        num_iters_mapping=15000,
        sil_thres=0.5,
        use_sil_for_loss=True,
        loss_weights=dict(im=0.5, depth=1.0),
        lrs_mapping=dict(
            means3D=0.00032, rgb_colors=0.0025, unnorm_rotations=0.001,
            logit_opacities=0.05, log_scales=0.005,
            cam_unnorm_rots=0.0, cam_trans=0.0),
        lrs_mapping_means3D_final=0.0000032,
        lr_delay_mult=0.01,
        use_gaussian_splatting_densification=True,
        densify_dict=dict(
            start_after=500, remove_big_after=3000, stop_after=15000,
            densify_every=100, grad_thresh=0.0002, num_to_split_into=2,
            removal_opacity_threshold=0.005,
            final_removal_opacity_threshold=0.005,
            reset_opacities=True, reset_opacities_every=3000),
    ),
    viz=dict(render_mode="color", offset_first_viz_cam=True,
             show_sil=False, visualize_cams=True, viz_w=600, viz_h=340,
             viz_near=0.01, viz_far=100.0, view_scale=2, viz_fps=5,
             enter_interactive_post_online=False),
)
