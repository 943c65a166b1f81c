#!/usr/bin/env bash
# FLOPs / throughput probe mirroring /root/reference/scripts/flops.sh.
python flops.py --model DiM-L/2 --image-size 256 --batch 1 --measure-throughput
