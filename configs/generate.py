"""Generate the per-scene .txt configs for every dataset family the
reference ships (configs/{benerf_blender,benerf_unreal,e2nerf_synthetic,
e2nerf_real}; family constants verified against /root/reference/configs and
SURVEY.md §2.3). Regenerate with: python configs/generate.py

Only calibration/eval constants differ per family; the training
hyperparameters are universal across all 15 reference scene configs.
"""

import os

HERE = os.path.dirname(os.path.abspath(__file__))

FAMILIES = {
    "benerf_blender": dict(
        dataset="BeNeRF_Blender",
        fx=541.850232, cx=300, cy=200, width=600, height=400,
        event_threshold=0.1, accumulate_time_length=0.1,
        scenes=["tanabata", "outdoorpool"],
        gray_variants=True,
    ),
    "benerf_unreal": dict(
        dataset="BeNeRF_Unreal",
        fx=548.409, cx=384, cy=240, width=768, height=480,
        event_threshold=0.1, accumulate_time_length=0.1,
        scenes=["livingroom", "whiteroom", "pinkcastle"],
        gray_variants=True,
    ),
    "e2nerf_synthetic": dict(
        dataset="E2NeRF_Synthetic",
        fx=1111.1110311937682, cx=400, cy=400, width=800, height=800,
        event_threshold=0.2, accumulate_time_length=0.25,
        scenes=["chair", "ficus", "hotdog", "lego", "materials", "mic"],
        gray_variants=False,
    ),
    "e2nerf_real": dict(
        dataset="E2NeRF_Real",
        fx=653.98456, cx=173, cy=130, width=346, height=260,
        event_threshold=-1, accumulate_time_length=0.25,
        scenes=["camera", "lego", "letter", "plant", "toys"],
        gray_variants=False,
    ),
}

TEMPLATE = """## settings
project = {family}_{scene}
datadir = ./data/{family}/{scene}{gray_suffix}
logdir = ./logs/{family}/{scene}{gray_suffix}
dataset = {dataset}
viewer = jsonl
model = benerf
depth = False
debug = False

## camera parameters
rgb_fx = {fx}
rgb_fy = {fx}
rgb_cx = {cx}
rgb_cy = {cy}
rgb_width = {width}
rgb_height = {height}
rgb_dist = [0, 0, 0, 0]
event_fx = {fx}
event_fy = {fx}
event_cx = {cx}
event_cy = {cy}
event_width = {width}
event_height = {height}
event_dist = [0, 0, 0, 0]

## event stream parameters
event_threshold = {event_threshold}
event_shift_start = 0
event_shift_end = 0
accumulate_time_length = {accumulate_time_length}
random_sampling_window = True
event_time_window = True

## nerf parameters
channels = {channels}
sampling_event_rays = 1024
sampling_rgb_rays = 1024
N_samples = 64
N_importance = 64
use_viewdirs = True
raw_noise_std = 0

## training option for nerf
optimize_nerf = True
load_checkpoint = False
lrate = 5e-4
decay_rate = 0.1

## training option for pose
optimize_pose = True
traj = spline
num_interpolated_pose = 19
use_barf_c2f = False
loadpose = False
pose_lrate = 5e-4
decay_rate_pose = 0.1

## training option for transform
optimize_trans = False
loadtrans = False
transform_lrate = 5e-4
decay_rate_transform = 0.1

## training option for rgb_crf
optimize_rgb_crf = False
rgb_crf_net_hidden = 0
rgb_crf_net_width = 128
rgb_crf_lrate = 5e-4
decay_rate_rgb_crf = 0.1

## training option for event_crf
optimize_event_crf = False
event_crf_net_hidden = 0
event_crf_net_width = 128
event_crf_lrate = 5e-4
decay_rate_event_crf = 0.1

## logging/saving
console_log_iter = 100
render_image_iter = 5000
render_video_iter = 80000
save_model_iter = 80000
max_iter = 80000

## loss config
rgb_loss = True
event_loss = True
event_coeff_syn = 0.1
event_coeff_real = 2.0
rgb_coeff = 1.0

## testing options
checkpoint = 80000
num_render_images = 19
num_extract_poses = 19
render_images = False
render_video = False
extract_poses = False
"""


def main():
    count = 0
    for family, spec in FAMILIES.items():
        outdir = os.path.join(HERE, family)
        os.makedirs(outdir, exist_ok=True)
        variants = [(3, "")]
        if spec["gray_variants"]:
            variants.append((1, "_gray"))
        for scene in spec["scenes"]:
            for channels, gray_suffix in variants:
                text = TEMPLATE.format(
                    family=family, scene=scene, channels=channels,
                    gray_suffix=gray_suffix, dataset=spec["dataset"],
                    fx=spec["fx"], cx=spec["cx"], cy=spec["cy"],
                    width=spec["width"], height=spec["height"],
                    event_threshold=spec["event_threshold"],
                    accumulate_time_length=spec["accumulate_time_length"],
                )
                path = os.path.join(outdir, f"{scene}{gray_suffix}.txt")
                with open(path, "w") as f:
                    f.write(text)
                count += 1
    print(f"wrote {count} scene configs")


if __name__ == "__main__":
    main()
