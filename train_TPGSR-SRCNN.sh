python3 main.py --arch="srcnn_tl" --batch_size=48 --mask --use_distill --gradient --sr_share --stu_iter=1 --vis_dir='vis_TPGSR-SRCNN'
