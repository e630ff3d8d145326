from im2im_uq_tpu.native import build

if __name__ == "__main__":
    print(f"built {build()}")
