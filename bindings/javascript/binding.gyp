{
  "targets": [
    {
      "target_name": "tapecraft",
      "sources": ["tapecraft_node.c"],
      "libraries": ["-ltapecraft", "-L<!(echo $TAPECRAFT_LIBDIR)"],
      "cflags": ["-O2"]
    }
  ]
}
