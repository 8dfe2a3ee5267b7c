#!/usr/bin/env bash
# prints: <steal_jiffies> <total_jiffies> from /proc/stat cpu line
awk '/^cpu / {steal=$9; tot=0; for(i=2;i<=NF;i++) tot+=$i; print steal, tot}' /proc/stat
