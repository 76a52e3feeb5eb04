from blackbox_mpc_tpu.cli import main

raise SystemExit(main())
