"""Shared SplaTAM-style experiment config builder.

The reference repeats a ~150-line dict per dataset
(configs/{replica,tum,scannet,scannetpp,replica_v2}/splatam.py); all
dataset configs here call `make_config` with only the values that differ.
Every key name matches the reference so its configs also load unchanged.
"""


def make_config(*, group_name, run_name, basedir, gradslam_data_cfg,
                sequence, desired_height, desired_width,
                map_every=5, keyframe_every=5, mapping_window_size=24,
                tracking_iters=10, mapping_iters=40,
                scene_radius_depth_ratio=3,
                tracking_lr_rot=0.0004, tracking_lr_trans=0.002,
                tracking_ignore_outlier_depth=False,
                tracking_use_depth_loss_thres=False,
                tracking_depth_loss_thres=100000,
                mapping_ignore_outlier_depth=False,
                densification_height=None, densification_width=None,
                tracking_height=None, tracking_width=None,
                seed=0, eval_every=5, checkpoint_interval=50,
                save_checkpoints=True, load_checkpoint=True,
                checkpoint_time_idx=-1, start=0, end=-1, stride=1,
                num_frames=-1, use_train_split=True, ignore_bad=False,
                flat_weight=50.0, iso_weight=2.0, iso_sample_size=8192,
                iso_k=16, workdir=None, extra_data=None,
                use_wandb=False, extra_top=None):
    data = dict(
        basedir=basedir,
        gradslam_data_cfg=gradslam_data_cfg,
        sequence=sequence,
        desired_image_height=desired_height,
        desired_image_width=desired_width,
        start=start, end=end, stride=stride, num_frames=num_frames,
        use_train_split=use_train_split, ignore_bad=ignore_bad,
    )
    if densification_height is not None:
        data["densification_image_height"] = densification_height
        data["densification_image_width"] = densification_width
    if tracking_height is not None:
        data["tracking_image_height"] = tracking_height
        data["tracking_image_width"] = tracking_width
    if extra_data:
        data.update(extra_data)

    return dict(
        workdir=workdir or f"./experiments/{group_name}",
        run_name=run_name,
        seed=seed,
        primary_device="tpu",
        map_every=map_every,
        keyframe_every=keyframe_every,
        mapping_window_size=mapping_window_size,
        report_global_progress_every=500,
        eval_every=eval_every,
        scene_radius_depth_ratio=scene_radius_depth_ratio,
        mean_sq_dist_method="projective",
        gaussian_distribution="isotropic",
        report_iter_progress=False,
        load_checkpoint=load_checkpoint,
        checkpoint_time_idx=checkpoint_time_idx,
        save_checkpoints=save_checkpoints,
        checkpoint_interval=checkpoint_interval,
        use_wandb=use_wandb,
        wandb=dict(entity="", project="IsoGS-TPU", group=group_name,
                   name=run_name, save_qual=False, eval_save_qual=True),
        isogs=dict(sample_size=iso_sample_size, k=iso_k,
                   target_saturation=1.0),
        data=data,
        tracking=dict(
            use_gt_poses=False,
            forward_prop=True,
            num_iters=tracking_iters,
            use_sil_for_loss=True,
            sil_thres=0.99,
            use_l1=True,
            ignore_outlier_depth_loss=tracking_ignore_outlier_depth,
            use_depth_loss_thres=tracking_use_depth_loss_thres,
            depth_loss_thres=tracking_depth_loss_thres,
            use_uncertainty_for_loss_mask=False,
            use_uncertainty_for_loss=False,
            use_chamfer=False,
            loss_weights=dict(im=0.5, depth=1.0),
            lrs=dict(means3D=0.0, rgb_colors=0.0, unnorm_rotations=0.0,
                     logit_opacities=0.0, log_scales=0.0,
                     cam_unnorm_rots=tracking_lr_rot,
                     cam_trans=tracking_lr_trans),
        ),
        mapping=dict(
            num_iters=mapping_iters,
            add_new_gaussians=True,
            sil_thres=0.5,
            use_l1=True,
            use_sil_for_loss=False,
            ignore_outlier_depth_loss=mapping_ignore_outlier_depth,
            use_uncertainty_for_loss_mask=False,
            use_uncertainty_for_loss=False,
            use_chamfer=False,
            loss_weights=dict(im=0.5, depth=1.0, flat=flat_weight,
                              iso=iso_weight),
            lrs=dict(means3D=0.0001, rgb_colors=0.0025,
                     unnorm_rotations=0.001, logit_opacities=0.05,
                     log_scales=0.001, cam_unnorm_rots=0.0, cam_trans=0.0),
            prune_gaussians=True,
            pruning_dict=dict(
                start_after=0, remove_big_after=0, stop_after=20,
                prune_every=20, removal_opacity_threshold=0.005,
                final_removal_opacity_threshold=0.005,
                reset_opacities=False, reset_opacities_every=500),
            use_gaussian_splatting_densification=False,
            densify_dict=dict(
                start_after=500, remove_big_after=3000, stop_after=5000,
                densify_every=100, grad_thresh=0.0002, num_to_split_into=2,
                removal_opacity_threshold=0.005,
                final_removal_opacity_threshold=0.005,
                reset_opacities_every=3000),
        ),
        viz=dict(render_mode="color", offset_first_viz_cam=True,
                 show_sil=False, visualize_cams=True, viz_w=600, viz_h=340,
                 viz_near=0.01, viz_far=100.0, view_scale=2, viz_fps=5,
                 enter_interactive_post_online=False),
    ) | (extra_top or {})


def scene_from_env(scenes, *env_names, default="0"):
    """Scene selection honoring the reference's env-var contract
    (SCENE_NUM for *_eval.py, SCENE for NVS/rendering configs — see
    reference configs/replica/replica_eval.py:10) as well as the repo's
    SPLATAM_SCENE_INDEX. First set env var wins; out-of-range falls back
    to scene 0."""
    import os
    idx = default
    for name in (*env_names, "SPLATAM_SCENE_INDEX"):
        if os.environ.get(name):
            idx = os.environ[name]
            break
    try:
        i = int(idx)
    except ValueError:
        i = 0
    return scenes[i] if 0 <= i < len(scenes) else scenes[0]
