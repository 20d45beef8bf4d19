python3 main.py --arch="rdn" --batch_size=48 --mask --use_distill --gradient --sr_share --stu_iter=1 --vis_dir='vis_RDN_ori'
