from dnnpde_tpu.cli import main

raise SystemExit(main())
