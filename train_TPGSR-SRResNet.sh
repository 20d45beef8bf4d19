python3 main.py --arch="srresnet_tl" --batch_size=48 --mask --gradient --sr_share --stu_iter=3 --vis_dir='vis_TPGSR-SRResNet_3_iters'
